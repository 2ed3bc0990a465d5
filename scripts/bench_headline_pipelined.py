#!/usr/bin/env python
"""Headline commit-core: latency vs pipelined throughput on the tunneled chip.

The round-4 headline (bench.py) times ONE dispatch of the jitted core and
divides by the step count — on a tunneled TPU that embeds a full dispatch
round-trip (~25 ms) in every step.  A production prover streams row blocks
back-to-back, so the honest throughput number is the *pipelined* steady
state: N distinct dispatches enqueued without intermediate syncs, wall
clock divided by N.  This script measures both, for the VPU-lc and MXU-lc
variants of the core, plus the isolated n-NTT piece pipelined (true
points/s without the per-dispatch RTT that core_pieces_r4f.json carries).

Every dispatch in every trial gets a unique input combination (pre-staged
distinct challenge vectors / salts) so the tunnel's identical-request
result cache can never short-circuit a timed call.  Only the 32-byte root
reference is retained per step, so peak HBM stays ~2 steps deep.

Usage: python scripts/bench_headline_pipelined.py [--rows 2048] [--k 512]
       [--depth 8] [--out headline_pipelined.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRIALS = 3


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--out", default="headline_pipelined.json")
    ap.add_argument("--skip-ntt-piece", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ligero_tpu.utils import jaxcache
    jaxcache.enable()
    from ligero_tpu.fields import BN254_FR
    from ligero_tpu.parallel import make_prover_core

    field = BN254_FR
    rows, k = args.rows, args.k
    n = 8 * k
    L = field.num_limbs
    elems = rows * n
    platform = jax.devices()[0].platform
    log(f"platform={platform} rows={rows} k={k} n={n} depth={args.depth}")

    rng = np.random.default_rng(7)

    def fresh_mont(count, width):
        ints = [int(x) for x in rng.integers(0, 2**62, count * width)]
        return field.ints_to_mont_limbs(ints).reshape(count, width, L)

    # one staged preenc (the 67 MB upload) + a distinct tiny challenge
    # vector for every dispatch that will ever happen (uniqueness defeats
    # the tunnel's identical-request result cache)
    n_r = 4 + TRIALS * args.depth
    log(f"staging inputs (one preenc + {n_r} challenge vectors)...")
    preenc = jax.device_put(fresh_mont(rows, k))
    rs = [jax.device_put(fresh_mont(1, rows).reshape(rows, L))
          for _ in range(n_r)]
    preenc.block_until_ready()
    for r in rs:
        r.block_until_ready()

    result = {"platform": platform, "rows": rows, "k": k, "n": n,
              "depth": args.depth, "variants": []}

    for variant, env in (("mxu_lc", "1"), ("vpu_lc", "0")):
        os.environ["LIGERO_MXU_LC"] = env
        fn = jax.jit(make_prover_core(field, rows, k, n, use_pallas=True))
        r_iter = iter(rs)
        t0 = time.time()
        np.asarray(fn(preenc, next(r_iter))[2])
        compile_s = time.time() - t0
        log(f"[{variant}] compile/warm {compile_s:.1f} s")

        # single-dispatch latency (round-4 methodology): fresh r each iter
        lat = []
        for _ in range(3):
            ra = next(r_iter)
            t0 = time.time()
            np.asarray(fn(preenc, ra)[2])
            lat.append(time.time() - t0)
        lat_best = min(lat)
        log(f"[{variant}] single-dispatch best {lat_best*1000:.1f} ms "
            f"({', '.join(f'{t*1000:.0f}' for t in lat)})")

        # pipelined throughput: enqueue depth distinct dispatches (keeping
        # only the 32-byte root refs — U buffers free as the stream
        # advances), sync once at the end
        best_step = float("inf")
        dispatch_s = None
        for trial in range(TRIALS):
            batch = [next(r_iter) for _ in range(args.depth)]
            t0 = time.time()
            roots = [fn(preenc, ra)[2] for ra in batch]
            t_dispatch = time.time() - t0
            np.asarray(roots[-1])            # in-order stream: forces all
            for ro in roots:
                ro.block_until_ready()
            wall = time.time() - t0
            step = wall / args.depth
            if step < best_step:
                best_step, dispatch_s = step, t_dispatch
            log(f"[{variant}] pipelined trial {trial}: wall {wall:.3f} s "
                f"-> {step*1000:.1f} ms/step (dispatch loop {t_dispatch:.3f} s)")
        result["variants"].append({
            "variant": variant,
            "compile_or_warm_s": round(compile_s, 2),
            "single_dispatch_ms": round(lat_best * 1000, 2),
            "single_dispatch_elems_per_s": round(elems / lat_best),
            "pipelined_ms_per_step": round(best_step * 1000, 2),
            "pipelined_elems_per_s": round(elems / best_step),
            "dispatch_loop_s": round(dispatch_s, 3),
        })
        r_iter = None
    os.environ.pop("LIGERO_MXU_LC", None)

    if not args.skip_ntt_piece:
        # isolated n-NTT piece, pipelined (closes the VERDICT question:
        # is the n=4096 shape below the 105M points/s plateau, or was the
        # gap just the per-dispatch RTT in core_pieces_r4f.json?).  A
        # pre-staged unique salt is ORed into one limb per dispatch so no
        # two requests are ever identical.
        from ligero_tpu.engine.mxu_ntt import mxu_any_ok, mxu_ntt_any
        from ligero_tpu.engine.pallas_ntt import ntt_pallas

        def ntt_n(c, salt):
            c = c.at[0, 0, 0].set(c[0, 0, 0] ^ (salt & jnp.uint32(0x7FFF)))
            padded = jnp.concatenate(
                [c, jnp.zeros((rows, n - k, L), jnp.uint32)], axis=1)
            if mxu_any_ok(n, field):
                return mxu_ntt_any(field, padded, n, canon_out=True)
            return ntt_pallas(field, padded, n, from_mont_out=True)
        ntt_fn = jax.jit(ntt_n)
        depth = 8
        salts = [jax.device_put(np.uint32(1000 + i))
                 for i in range(1 + TRIALS * depth)]
        s_iter = iter(salts)
        np.asarray(ntt_fn(preenc, next(s_iter))[0, :1])
        best = float("inf")
        for trial in range(TRIALS):
            batch = [next(s_iter) for _ in range(depth)]
            t0 = time.time()
            outs = [ntt_fn(preenc, s)[0, 0, :1] for s in batch]
            np.asarray(outs[-1])
            for o in outs:
                o.block_until_ready()
            best = min(best, (time.time() - t0) / depth)
        pts = rows * n / best
        log(f"ntt_n{n}_canon pipelined: {best*1000:.1f} ms/step "
            f"-> {pts/1e6:.1f}M points/s")
        result["ntt_piece"] = {
            "name": f"ntt_n{n}_canon", "pipelined_ms": round(best * 1000, 2),
            "points_per_s": round(pts)}

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    log(f"wrote {args.out}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
