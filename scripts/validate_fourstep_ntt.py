#!/usr/bin/env python
"""TPU validation + rate measurement of the four-step Pallas NTT
(n = 32768 / 65536, past the single-kernel VMEM bound).

Bit-compares ntt_pallas_any against the host NTT plan (forward, inverse,
and the fused from-mont epilogue), then measures the on-chip rate for
PERF.md.  Must run on the TPU — Pallas interpret mode hangs on this CPU
backend (.claude/skills/verify/SKILL.md).

Covers /root/reference/src/ligero/mod.rs:998-1012 at 2^21+ scales.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def rand_mont(field, count, seed):
    rng = np.random.default_rng(seed)
    ints = [int(x) for x in rng.integers(0, 2 ** 63, count)]
    return field.ints_to_mont_limbs(ints)


def main():
    import jax
    import jax.numpy as jnp

    from ligero_tpu.engine.fieldops import FieldKernel
    from ligero_tpu.engine.ntt import NTTPlan
    from ligero_tpu.engine.pallas_ntt import ntt_pallas_any
    from ligero_tpu.fields import BN254_FR
    from ligero_tpu.utils import jaxcache

    jaxcache.enable()
    field = BN254_FR
    fk = FieldKernel(field, np)
    log(f"platform: {jax.devices()[0].platform}")

    results = []
    for n in (32768, 65536):
        B = 8
        L = field.num_limbs
        x = rand_mont(field, B * n, seed=n).reshape(B, n, L)
        xd = jnp.asarray(x)

        # forward
        t0 = time.time()
        fwd = np.asarray(jax.jit(
            lambda a, n=n: ntt_pallas_any(field, a, n))(xd))
        log(f"n={n} fwd first call {time.time()-t0:.1f}s")
        host_fwd = NTTPlan(fk, n, inverse=False)(x)
        assert np.array_equal(fwd, host_fwd), f"FWD mismatch at n={n}"
        log(f"n={n} forward bit-exact OK")

        # inverse roundtrip + direct compare
        inv = np.asarray(jax.jit(
            lambda a, n=n: ntt_pallas_any(field, a, n, inverse=True))(
                jnp.asarray(fwd)))
        assert np.array_equal(inv, x), f"INV roundtrip mismatch at n={n}"
        log(f"n={n} inverse roundtrip bit-exact OK")

        # fused from-mont epilogue
        canon = np.asarray(jax.jit(
            lambda a, n=n: ntt_pallas_any(field, a, n, from_mont_out=True))(xd))
        host_canon = fk.from_mont(host_fwd)
        assert np.array_equal(canon, host_canon), f"FROM-MONT mismatch n={n}"
        log(f"n={n} fused from-mont epilogue bit-exact OK")

        # rate: fresh inputs per run (result-cache defense), small transfer
        Br = 64
        f = jax.jit(lambda a, n=n: ntt_pallas_any(field, a, n))
        xs = [jnp.asarray(rand_mont(field, Br * n, seed=n * 10 + i)
                          .reshape(Br, n, L)) for i in range(3)]
        f(xs[0]).block_until_ready()
        t0 = time.time()
        for xi in xs:
            np.asarray(f(xi)[0, 0, 0])
        dt = (time.time() - t0) / len(xs)
        rate = Br * n / dt
        log(f"n={n}: {Br} rows in {dt*1e3:.0f} ms -> {rate/1e6:.1f} M points/s")
        results.append({"n": n, "rows": Br, "s_per_batch": round(dt, 4),
                        "points_per_s": round(rate, 0), "bit_exact": True})

    out = {"platform": jax.devices()[0].platform, "results": results}
    with open("fourstep_ntt_validation.json", "w") as f:
        json.dump(out, f, indent=1)
    log("wrote fourstep_ntt_validation.json")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
