"""Tunnel transfer-cost profiler: what does one host->device upload of
N bytes actually cost through this host's RPC tunnel?

Attribution evidence for the register wall-minus-device gap: the
register graph ships ONE packed buffer per call (graph.py::
pack_register_frame; 5.125 B/px + 8 B footer — 1.57 MB full-frame at
640x480, ~0.76 MB for the 384-px ROI window the bench scene selects),
plus a handful of small arrays (K, rot grid refs are device-resident),
and fetches a pose + order back. This script measures, on the live
chip:

  - RTT: median null-dispatch round trip
  - device_put cost vs payload size (16 KB ... 4 MB)
  - the marginal bandwidth between successive sizes
  - one full pack->upload->unpack-jit dispatch at the bench's ROI and
    full-frame sizes

so the residual gap can be split into (a) bytes at measured bandwidth
and (b) fixed per-call RPC overhead, neither of which a kernel can
remove. Referenced by README's register wall attribution.
"""
import time

import numpy as np


def median_time(fn, n=9, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}")

    # null dispatch RTT (tiny scalar add, result fetched)
    one = jnp.float32(1.0)
    f = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(f(one))
    rtt = median_time(lambda: np.asarray(f(one)))
    print(f"null dispatch+fetch RTT: {rtt * 1e3:7.2f} ms")

    rng = np.random.default_rng(0)
    sizes = [2**14, 2**16, 2**18, 2**20, 2**21, 2**22]
    prev = None
    print(f"{'bytes':>10} {'put ms':>9} {'marginal MB/s':>14}")
    for n in sizes:
        buf = rng.integers(0, 255, n, dtype=np.uint8)
        t = median_time(
            lambda b=buf: jax.block_until_ready(jax.device_put(b, dev))
        )
        marg = ""
        if prev is not None:
            dn, dt = n - prev[0], t - prev[1]
            if dt > 0:
                marg = f"{dn / dt / 1e6:12.1f}"
        print(f"{n:>10} {t * 1e3:9.2f} {marg:>14}")
        prev = (n, t)

    # The bench register's two upload regimes, through the real pack
    from foundationpose_tpu.pipeline.graph import (
        pack_register_frame, unpack_register_frame,
    )

    H, W = 480, 640
    rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    depth = rng.uniform(0.3, 2.0, (H, W)).astype(np.float32)
    mask = (rng.uniform(size=(H, W)) < 0.2).astype(np.uint8)
    for label, win in (("full 640x480", None), ("ROI 384px", 384)):
        if win is None:
            r, d, m, hw = rgb, depth, mask, (H, W)
        else:
            r = rgb[:win, :win]
            d = depth[:win, :win]
            m = mask[:win, :win]
            hw = (win, win)
        unpack = jax.jit(
            lambda b, hw=hw: [jnp.sum(o) for o in unpack_register_frame(b, hw)]
        )

        def run(r=r, d=d, m=m, unpack=unpack):
            buf = pack_register_frame(r, d, m, 0, 0)
            return jax.block_until_ready(unpack(buf))

        t = median_time(run)
        nb = H * W * 5 + H * W // 8 + 8 if win is None else (
            win * win * 5 + win * win // 8 + 8
        )
        print(
            f"pack+upload+unpack dispatch, {label}: {t * 1e3:7.2f} ms "
            f"({nb / 1e6:.2f} MB -> {nb / t / 1e6:.1f} MB/s incl. RTT)"
        )


if __name__ == "__main__":
    main()
