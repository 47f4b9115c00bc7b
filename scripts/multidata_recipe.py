"""Multidata harness with the winning w48+gamma0.9975 recipe.

The elast recipe sweep (output/recipe_results_r2.json) beat FSAI on the
twist family; multidata is the same data type at mixed resolutions, so
the recipe should transfer. 800 epochs, torch init, eval-eps sweep.

Usage: python scripts/multidata_recipe.py [epochs=800]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tpu_spai  # noqa: F401
    from tpu_spai.bench.parity import run_family
    from tpu_spai.datagen.elasticity import TwistDatagen

    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    epochs = int(kv.get("epochs", 800))
    wd = "/tmp/recipe_fast"
    os.makedirs(wd, exist_ok=True)
    for res in (3, 4):
        p = f"{wd}/twist_md_r{res}"
        if not os.path.isdir(os.path.join(p, "mat")):
            TwistDatagen(prefix=p, nx=2, resolution=res, max_count=10,
                         time_step=0.02).generate()
    stats = run_family(
        "multidata_w48", lambda: None, {},
        ["data.block_size=3", "data.has_shared_features=true",
         "workspace=scaled", "scheduler.params.gamma=0.9975",
         "gnn_features=48"],
        epochs, wd,
        multi_prefixes=[f"{wd}/twist_md_r3", f"{wd}/twist_md_r4"],
        weight_init="torch",
    )
    out = {k: v for k, v in stats.items() if "iter" in k or "eps" in k}
    print(json.dumps(out, indent=1))
    with open("output/recipe_multidata.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
