"""CPU preflight for a planned TPU training run: same CLI overrides,
fast_dev_run=true on the CPU backend — catches flag/dataset mistakes
before a TPU slot is spent.

Usage: python scripts/preflight_train.py <train-cli-overrides...>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tpu_spai  # noqa: F401
    from tpu_spai.cli import train as train_cli

    args = list(sys.argv[1:]) + [
        "trainer.fast_dev_run=true",
        "check_converge=false",
        "output_dir=/tmp/preflight_out",
        "resume=",
    ]
    train_cli.main(args)
    print("PREFLIGHT OK")


if __name__ == "__main__":
    main()
