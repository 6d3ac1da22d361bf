"""Real-TPU validation + timing of the relayout kernels
(ops/pallas_relayout.py) and the s2d-direct quad entry's packing path.

Usage:  python scripts/validate_relayout_tpu.py [check|time]

check: relayout_pad_nchw / relayout_nhwc vs the XLA oracle (moveaxis +
pad) on hardware, exact-equality expected (pure data movement).
time:  slope-timed production-shape comparison (b4 flagship HR: ls_s2d
(8, 192, 640, 504) bf16, rpad=384) of the kernel pass vs the XLA pair.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0][..., :1, :1])


def check():
    from planedepth_tpu.ops.pallas_relayout import (
        relayout_nhwc, relayout_pad_nchw,
    )

    rng = np.random.RandomState(0)
    for (lpad, rpad), dtype in [((0, 384), jnp.bfloat16),
                                ((0, 128), jnp.float32),
                                ((128, 256), jnp.bfloat16)]:
        x = jnp.asarray(rng.randn(2, 16, 640, 37).astype(np.float32), dtype)
        got = np.asarray(relayout_pad_nchw(x, lpad, rpad, rows=8),
                         np.float32)
        ref = np.asarray(jnp.pad(jnp.moveaxis(x, -1, 1),
                                 ((0, 0), (0, 0), (0, 0), (lpad, rpad))),
                         np.float32)
        ok = np.array_equal(got, ref)
        print(f"pad_nchw lpad={lpad} rpad={rpad} {dtype.__name__}: "
              f"{'OK' if ok else 'MISMATCH max %.3g' % np.abs(got - ref).max()}")
        g = jnp.asarray(rng.randn(2, 37, 16, 640).astype(np.float32), dtype)
        got = np.asarray(relayout_nhwc(g, rows=8), np.float32)
        ref = np.asarray(jnp.moveaxis(g, 1, -1), np.float32)
        ok = np.array_equal(got, ref)
        print(f"nhwc {dtype.__name__}: "
              f"{'OK' if ok else 'MISMATCH max %.3g' % np.abs(got - ref).max()}")


def timeit():
    from planedepth_tpu.ops.pallas_relayout import (
        relayout_nhwc, relayout_pad_nchw,
    )

    B, Hq, W2, C = 8, 192, 640, 504          # b4 flagship, 49+14 planes
    lpad, rpad = 0, 384
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, Hq, W2, C).astype(np.float32),
                    jnp.bfloat16)
    g = jnp.asarray(rng.randn(B, C, Hq, W2).astype(np.float32),
                    jnp.bfloat16)

    def slope(f, *a):
        f = jax.jit(f)
        _sync(f(*a))
        for n in (2, 12):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = f(*a)
            _sync(o)
            dt = time.perf_counter() - t0
            if n == 2:
                dt2 = dt
        return (dt - dt2) / 10 * 1e3

    def xla_pack(x):
        return jnp.pad(jnp.moveaxis(x, -1, 1),
                       ((0, 0), (0, 0), (0, 0), (lpad, rpad)))

    for r in (8, 16, 32):
        print(f"kernel pad_nchw rows={r}: "
              f"{slope(lambda v: relayout_pad_nchw(v, lpad, rpad, rows=r), x):.2f} ms")
    print(f"XLA moveaxis+pad: {slope(xla_pack, x):.2f} ms")
    for r in (8, 16):
        print(f"kernel nhwc (bwd) rows={r}: "
              f"{slope(lambda v: relayout_nhwc(v, rows=r), g):.2f} ms")
    print(f"XLA moveaxis (bwd): {slope(lambda v: jnp.moveaxis(v, 1, -1) + 0.0, g):.2f} ms")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    print("backend:", jax.default_backend())
    if mode == "check":
        check()
    else:
        timeit()
