"""Recipe search for the families where neural trails FSAI (CPU).

Sweeps training-recipe variants through bench/parity.run_family on the
harness-scale families and prints a comparison table. The shared
hypothesis: the reference's exp(0.99) LR decay starves 500-epoch runs
(lr ~7e-6 by epoch 500); slower decay and/or more capacity closes the
FSAI gap (the synthetic family already needed this — docs/PERF.md).

Usage: python scripts/recipe_search.py [families=heat_tetmesh,elast_twist_bsr3]
"""

import json
import os
import sys

import numpy as np  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# per-family variant menus: the losing families need different levers
# (the synthetic family is already wide+slow-decay in the parity recipe)
VARIANTS = {
    "default": {
        "base": [],
        "g995": ["scheduler.params.gamma=0.995"],
        "g995_w32": ["scheduler.params.gamma=0.995", "gnn_features=32"],
        "g995_w32_mp6": [
            "scheduler.params.gamma=0.995", "gnn_features=32",
            "gnn.num_mp_layers=6",
        ],
    },
    # round-2b aggressive menu (run with epochs=800): the first sweep
    # showed capacity+slow-decay halves the elast gap; push further
    "aggressive": {
        "w48_g9975": ["scheduler.params.gamma=0.9975", "gnn_features=48"],
        "w48_mp6_g9975": [
            "scheduler.params.gamma=0.9975", "gnn_features=48",
            "gnn.num_mp_layers=6",
        ],
    },
    # round-2c: heat_tetmesh final push (gap 32.3 vs FSAI 30.7 at w48)
    "heat_final": {
        "w64_g999": ["scheduler.params.gamma=0.999", "gnn_features=64"],
    },
    "synthetic": {
        "base": [],
        "w64": ["gnn_features=64"],
        "mp8": ["gnn.num_mp_layers=8"],
    },
    # round-3: only the NEW levers (base = the known round-2 recipe);
    # depth first — the family is pure-algebra, locality-free
    "synthetic_r3": {
        "mp8": ["gnn.num_mp_layers=8"],
        "w64": ["gnn_features=64"],
    },
    # round-4: the long-budget hypothesis at the production w48-mp6
    # recipe (VERDICT r3 item 7: capacity levers measured negative;
    # epochs=650 x epochs_mult=4 = 2600 effective)
    "synthetic_long": {
        "base": [],
    },
    # round-5: heat_tetmesh — the axes never swept (VERDICT r4 weak #4:
    # loss variant, matrix normalization, train-time epsilon,
    # edge-feature aggregation); all on top of the production w48/g9975
    "heat_axes": {
        "base": ["scheduler.params.gamma=0.9975", "gnn_features=48"],
        "loss_cg": [
            "scheduler.params.gamma=0.9975", "gnn_features=48",
            "loss.name=ConjGradLoss_ANorm",
        ],
        "loss_l2": [
            "scheduler.params.gamma=0.9975", "gnn_features=48",
            "loss.name=L2Loss_ANorm",
        ],
        "norm_none": [
            "scheduler.params.gamma=0.9975", "gnn_features=48",
            "data.normalize_matrix=none",
        ],
        "norm_frob": [
            "scheduler.params.gamma=0.9975", "gnn_features=48",
            "data.normalize_matrix=frob",
        ],
        "eps_1e3": [
            "scheduler.params.gamma=0.9975", "gnn_features=48",
            "epsilon=1.0e-3",
        ],
        "edge_mean": [
            "scheduler.params.gamma=0.9975", "gnn_features=48",
            "data.use_edge_features_as_node_feature=mean",
        ],
    },
    # round-5: confirm the heat_axes winner (ConjGradLoss_ANorm hit 31.0
    # vs FSAI 30.67 at 500 epochs) at the 800-epoch scorecard budget
    "heat_cg_800": {
        "loss_cg": [
            "scheduler.params.gamma=0.9975", "gnn_features=48",
            "loss.name=ConjGradLoss_ANorm",
        ],
    },
    # round-3: heat_tetmesh second attempt (w64_g999 gave 32.3 = w48)
    "heat_final2": {
        "w48_mp8": [
            "scheduler.params.gamma=0.9975", "gnn_features=48",
            "gnn.num_mp_layers=8",
        ],
    },
}

FAMILIES = {
    "synthetic": dict(
        gen=lambda wd: __import__(
            "tpu_spai.datagen.synthetic", fromlist=["SyntheticDatagen"]
        ).SyntheticDatagen(
            prefix=f"{wd}/synthetic", max_count=16, low=200, high=280,
            sparsity=1.5e-2, alpha=1e-3, seed=7,
        ).generate(),
        overrides=lambda wd: [
            f"data.prefix={wd}/synthetic", "data.is_fixed_topology=false",
            "data.has_shared_features=false", "data.use_node_features=false",
            "data.use_edge_features_as_node_feature=mean",
            "gnn_features=48", "gnn.num_mp_layers=6",
            "scheduler.params.gamma=0.9995",
        ],
        epochs_mult=4,
    ),
    "heat_tetmesh": dict(
        gen=lambda wd: __import__(
            "tpu_spai.datagen.heat", fromlist=["MultimeshHeatDatagen"]
        ).MultimeshHeatDatagen(
            prefix=f"{wd}/heat_mm", max_count=16, res_range=(5, 7), seed=5
        ).generate(),
        overrides=lambda wd: [
            f"data.prefix={wd}/heat_mm", "data.is_fixed_topology=false",
            "data.has_shared_features=false",
        ],
    ),
    "elast_twist_bsr3": dict(
        gen=lambda wd: __import__(
            "tpu_spai.datagen.elasticity", fromlist=["TwistDatagen"]
        ).TwistDatagen(
            prefix=f"{wd}/twist", nx=2, resolution=3, max_count=10,
            time_step=0.02,
        ).generate(),
        overrides=lambda wd: [
            f"data.prefix={wd}/twist", "data.block_size=3",
            "data.has_shared_features=true", "workspace=scaled",
        ],
    ),
}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tpu_spai  # noqa: F401
    from tpu_spai.bench.parity import run_family

    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    menu_key = kv.get("menu", "")
    if menu_key and menu_key not in VARIANTS:
        sys.exit(
            f"unknown menu={menu_key!r}; available: {sorted(VARIANTS)}"
        )  # a typo must not silently run the wrong expensive sweep
    kv_menu = VARIANTS.get(menu_key, None)
    fams = kv.get("families", "heat_tetmesh,elast_twist_bsr3").split(",")
    epochs = int(kv.get("epochs", 500))
    wd = kv.get("workdir", "/tmp/recipe_search")
    os.makedirs(wd, exist_ok=True)

    results = {}
    for fam in fams:
        spec = FAMILIES[fam]
        gen_done = [False]

        def gen_once():
            if not gen_done[0]:
                spec["gen"](wd)
                gen_done[0] = True

        fam_epochs = epochs * int(spec.get("epochs_mult", 1))
        menu = kv_menu if kv_menu else VARIANTS.get(fam, VARIANTS["default"])
        for vname, vover in menu.items():
            key = f"{fam}/{vname}"
            try:
                stats = run_family(
                    f"{fam}_{vname}", gen_once, {},
                    spec["overrides"](wd) + vover, fam_epochs, wd,
                    weight_init="torch",
                )
                best_eps = min(
                    [stats.get("Val/cpu_neural_iter", 1e9)]
                    + [v for k, v in stats.items() if "_eps" in k]
                )
                results[key] = {
                    "neural": stats.get("Val/cpu_neural_iter"),
                    "neural_best_eps": best_eps,
                    "fsai": stats.get("Val/cpu_fsai_iter"),
                    "ainv": stats.get("Val/cpu_ainv_iter"),
                    "ic": stats.get("Val/cpu_ic_iter"),
                }
            except Exception as exc:  # noqa: BLE001
                results[key] = {"error": str(exc)[:200]}
            print(json.dumps({key: results[key]}), flush=True)

    out_name = kv.get("out", "recipe_results.json")
    with open(os.path.join(wd, out_name), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
