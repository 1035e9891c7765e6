"""Probe: does batching cameras into one band_pass Pallas call save time?

The multicam step unrolls cameras because XLA lowers batched GATHERS
~2.5x slower — but the warp band kernel has no gathers, so the 4 cameras'
band passes could share one pallas_call (channel axis 4 -> 16) if the
per-call fixed cost is non-trivial. This measures one (16, ...) call vs
four (4, ...) calls on production-like shapes (factor 1.0 pass 1:
src (4, 960, 640), pos (4, 544, 640)).

Run: python experiments/band_batch_probe.py
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vision_processor_tpu.ops.warp import BLK, LAN, WIN, band_pass

    _ = np.asarray(jnp.ones((8, 128)) * 2.0)

    rng = np.random.default_rng(0)
    R, C, n_out = 960, 640, 544
    nb, nt = n_out // BLK, C // LAN

    def mk(ch):
        src = jnp.asarray(rng.uniform(0, 255, (ch, R, C)).astype(np.float32))
        base = rng.uniform(0, R - WIN - 2, (nb, nt)).astype(np.float32)
        pos = np.repeat(np.repeat(base, BLK, 0), LAN, 1)[None] + rng.uniform(
            0, WIN - 2, (ch, n_out, C)
        ).astype(np.float32) * 0 + rng.uniform(0, 1, (ch, n_out, C)).astype(
            np.float32
        )
        r0 = np.floor(base).astype(np.int32)
        return src, jnp.asarray(pos), jnp.asarray(r0)

    s4 = [mk(4) for _ in range(4)]
    s16_src = jnp.concatenate([s[0] for s in s4])
    s16_pos = jnp.concatenate([s[1] for s in s4])
    # per-camera r0 differs; emulate the shared-call variant with one r0
    # (the kernel reads r0[rb, ct] only — same cost profile)
    s16_r0 = s4[0][2]

    def four_calls(seed):
        outs = [
            band_pass(s[0] + seed * 0, s[1], s[2]) for s in s4
        ]
        return jnp.stack([jnp.sum(o) for o in outs])

    def one_call(seed):
        return jnp.sum(band_pass(s16_src + seed * 0, s16_pos, s16_r0))

    def scan_time(fn, tag, n_lo=40, n_hi=200):
        def make(n):
            def sf(c0):
                def body(c, _):
                    out = fn(c)
                    return c + jnp.sum(out) * 1e-20, jnp.sum(out)
                return jax.lax.scan(body, c0, None, length=n)
            return jax.jit(sf)
        fns = {n: make(n) for n in (n_lo, n_hi)}
        for n in (n_lo, n_hi):
            jax.block_until_ready(fns[n](jnp.float32(0)))
        best = []
        for _ in range(3):
            ts = {}
            for n in (n_lo, n_hi):
                t0 = time.perf_counter()
                jax.block_until_ready(fns[n](jnp.float32(0)))
                ts[n] = time.perf_counter() - t0
            best.append((ts[n_hi] - ts[n_lo]) / (n_hi - n_lo) * 1e3)
        print(f"{tag:34s} {min(best):7.3f} ms  "
              f"(runs: {', '.join(f'{x:.3f}' for x in best)})")

    scan_time(four_calls, "4 x band_pass(4ch)")
    scan_time(one_call, "1 x band_pass(16ch)")


if __name__ == "__main__":
    main()
