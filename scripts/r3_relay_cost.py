"""Quantify the axon-relay per-dispatch cost: fixed latency vs arg-bytes
vs fetch-bytes (decides how much fusing construct+solve into one program
can save end-to-end). Emits output/r3_relay_cost.json."""
import json
import sys
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import tpu_spai  # noqa: F401

OUT = {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t_min(fn, reps=9):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3  # ms


@jax.jit
def tiny(x):
    return x.sum()


@jax.jit
def tiny_with_big(x, big):
    return x.sum() + big.ravel()[0] * 0.0


@jax.jit
def big_out(x, n):
    del n
    return jnp.broadcast_to(x.sum(), (1 << 20,))  # 4 MB output


x8 = jnp.ones(8, jnp.float32)
for mb in (0, 1, 4, 16):
    if mb == 0:
        f = lambda: np.asarray(tiny(x8))  # noqa: E731
        name = "tiny_dispatch_fetch_ms"
    else:
        big = jnp.ones((mb << 20) // 4, jnp.float32)
        f = lambda big=big: np.asarray(tiny_with_big(x8, big))  # noqa: E731
        name = f"dispatch_{mb}mb_arg_ms"
    OUT[name] = round(t_min(f), 3)
    log(name, OUT[name])

# fetch scaling: 4 MB result
OUT["dispatch_4mb_out_ms"] = round(
    t_min(lambda: np.asarray(big_out(x8, 0))), 3
)
log("dispatch_4mb_out_ms", OUT["dispatch_4mb_out_ms"])

# dispatch WITHOUT fetch (async) — proxy for queueing cost
def nofetch():
    r = tiny(x8)
    r.block_until_ready()  # no-op through relay per CLAUDE.md


OUT["tiny_dispatch_only_ms"] = round(t_min(nofetch), 3)
log("tiny_dispatch_only_ms", OUT["tiny_dispatch_only_ms"])

# repeated dispatch of the SAME big-arg program (device-resident arg):
# second call should skip any re-upload if the relay caches buffers
big = jnp.ones(1 << 20, jnp.float32)  # 4 MB
t_all = []
np.asarray(tiny_with_big(x8, big))
for _ in range(9):
    t0 = time.perf_counter()
    np.asarray(tiny_with_big(x8, big))
    t_all.append(time.perf_counter() - t0)
OUT["resident_4mb_arg_repeat_ms"] = round(min(t_all) * 1e3, 3)
log("resident_4mb_arg_repeat_ms", OUT["resident_4mb_arg_repeat_ms"])

with open("output/r3_relay_cost.json", "w") as f2:
    json.dump(OUT, f2, indent=2)
print(json.dumps(OUT))
