"""Probe: s8 x s8 matmul compile cost + rate, XLA vs Pallas (encoder fusion
feasibility, VERDICT r4 #4 + the compile_s regression).

tools/compile_breakdown.py attributed ~700 s of the cold bench compile to
the s8 x s8 activation-quant encoder (805 s with vs 107 s without).  The
suspects are the XLA int8 dot_generals (6/layer).  This probe times, at
the encoder's production shape (M = 1500 rows x batch-grid, K = N = 1280):

  xla_s8    one jitted XLA s8 x s8 -> s32 dot
  xla_bf16  the bf16 dot (baseline)
  pallas_s8 a Pallas kernel doing the same s8 dot per grid block
  pallas_bf16

Each stage jits a FRESH program (distinct constants) so compiles are
cold modulo the opaque backend-side cache.  Prints JSON lines.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1500 * 8)
    ap.add_argument("--k", type=int, default=1280)
    ap.add_argument("--n", type=int, default=1280)
    ap.add_argument("--stages", default="xla_s8,xla_bf16,pallas_s8,pallas_bf16")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    m, k, n = args.m, args.k, args.n
    rng = np.random.default_rng(0)
    x8 = rng.integers(-127, 128, (m, k), dtype=np.int8)
    w8 = rng.integers(-127, 128, (k, n), dtype=np.int8)
    xb = (x8.astype(np.float32) / 127.0).astype(jnp.bfloat16.dtype.name
                                                if False else np.float32)

    flops = 2.0 * m * k * n

    def run(name, fn, *operands):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        out = f(*operands)
        np.asarray(out)
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(f(*operands))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(json.dumps({"stage": name, "compile_s": round(comp, 1),
                          "run_s": round(dt, 4),
                          "tflops": round(flops / dt / 1e12, 1)}),
              flush=True)

    if "xla_s8" in args.stages:
        def xla_s8(x, w):
            acc = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return jnp.sum(acc)  # scalar fetch (relay)

        run("xla_s8", xla_s8, jnp.asarray(x8), jnp.asarray(w8))

    if "xla_bf16" in args.stages:
        def xla_bf16(x, w):
            acc = jnp.matmul(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            return jnp.sum(acc)

        run("xla_bf16", xla_bf16, jnp.asarray(xb), jnp.asarray(
            (w8.astype(np.float32) / 127.0)))

    # ---- Pallas: grid over M blocks, full K x N weight resident --------
    bm = 1024

    def make_pallas(s8: bool):
        def kernel(x_ref, w_ref, o_ref):
            x = x_ref[...]
            w = w_ref[...]
            if s8:
                acc = jax.lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                o_ref[...] = acc.astype(jnp.float32)
            else:
                acc = jax.lax.dot_general(
                    x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o_ref[...] = acc

        @functools.partial(jax.jit)
        def f(x, w):
            out = pl.pallas_call(
                kernel,
                grid=(m // bm,),
                in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0)),
                          pl.BlockSpec((k, n), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            )(x, w)
            return jnp.sum(out)

        return f

    if "pallas_s8" in args.stages:
        f = make_pallas(True)
        t0 = time.perf_counter()
        try:
            out = f(jnp.asarray(x8), jnp.asarray(w8))
            np.asarray(out)
            comp = time.perf_counter() - t0
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                np.asarray(f(jnp.asarray(x8), jnp.asarray(w8)))
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            print(json.dumps({"stage": "pallas_s8",
                              "compile_s": round(comp, 1),
                              "run_s": round(dt, 4),
                              "tflops": round(flops / dt / 1e12, 1)}),
                  flush=True)
        except Exception as e:  # Mosaic may not lower s8 dots
            print(json.dumps({"stage": "pallas_s8",
                              "error": str(e)[:300]}), flush=True)

    if "pallas_bf16" in args.stages:
        f = make_pallas(False)
        xbf = jnp.asarray(x8.astype(np.float32))
        wbf = jnp.asarray(w8.astype(np.float32))
        t0 = time.perf_counter()
        out = f(xbf, wbf)
        np.asarray(out)
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(f(xbf, wbf))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(json.dumps({"stage": "pallas_bf16", "compile_s": round(comp, 1),
                          "run_s": round(dt, 4),
                          "tflops": round(flops / dt / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
