#!/usr/bin/env python
"""Probe: does the NH = nbin/2+1 = 1025 trailing dim (padded to 1152 by
the f32 (8,128) tiling) cost real HBM bandwidth vs an aligned 1024?

Times a 2-stream reduce (the fgh loop's Gr/Gi read pattern) over
(B, nchan, NH) f32 for NH in {1024, 1025, 1152}, pipelined (queue REPS,
fetch one scalar) per the tunnel rules in PERF.md.  GB/s is *useful*
bytes (2 arrays x B x nchan x NH x 4) / time.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

B = int(os.environ.get("PP_PROBE_B", 16))
NCHAN = int(os.environ.get("PP_PROBE_NCHAN", 4096))
REPS = int(os.environ.get("PP_PROBE_REPS", 20))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if "--platform" in sys.argv:
    jax.config.update("jax_platforms",
                      sys.argv[sys.argv.index("--platform") + 1])
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/pp_jax_compilation_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)

for NH in (1024, 1025, 1152):
    gr = jax.device_put(jnp.asarray(
        rng.normal(0, 1, (B, NCHAN, NH)).astype(np.float32)))
    gi = jax.device_put(jnp.asarray(
        rng.normal(0, 1, (B, NCHAN, NH)).astype(np.float32)))

    @jax.jit
    def red(a, b):
        return jnp.sum(a + 2.0 * b)

    r = red(gr, gi)
    np.asarray(r)                      # warm + force completion
    t0 = time.time()
    outs = [red(gr, gi) for _ in range(REPS)]
    # device executions are in-order: fetching the LAST value syncs the
    # whole queue with ONE tunnel round trip (per-output fetches would
    # pay ~30 ms latency each and swamp the measurement)
    s = float(np.asarray(outs[-1]))
    dt = (time.time() - t0) / REPS
    gb = 2 * B * NCHAN * NH * 4 / 1e9
    print(f"NH={NH:5d}  {dt * 1e3:8.2f} ms  useful {gb / dt:7.1f} GB/s"
          f"  (physical {gb / dt * (-(-NH // 128) * 128) / NH:7.1f})"
          f"  [checksum {s:.3e}]", flush=True)
