"""Re-probe the Mosaic walls that retired the split-basis Pallas STFT.

PERF_NOTES "Pallas split-basis STFT kernel: CLOSED": the 0.70 ms core
(vs 1.40 ms XLA) was blocked only by three Mosaic limitations.  This
probes each one on the CURRENT toolchain, each in a subprocess with a
timeout (two of the walls were compiler HANGS, not errors):

  1. value slice at sublane offset 1   (blk[1:FB+1] — hung >15 min)
  2. in-kernel transpose               (z.T — hung)
  3. stride-2 lane slice               (x[:, ::2] — rejected)

If any flips to OK, the kernel is worth ~15% end-to-end serving
(5.6 -> ~4.9 ms/shot) and should be revisited.  Run per round:

    python scripts/probe_mosaic_walls.py        # on the TPU
"""

import json
import os
import subprocess
import sys

PROBES = {
    "sublane_offset1_slice": """
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
FB = 256
def k(x_ref, o_ref):
    blk = x_ref[...]            # (FB+8, 256)
    o_ref[...] = blk[1:FB+1]    # sublane offset-1 value slice
x = jnp.ones((FB + 8, 256), jnp.float32)
out = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((FB, 256), jnp.float32)
)(x)
print("RESULT_OK", float(out[0, 0]))
""",
    "in_kernel_transpose": """
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
def k(x_ref, o_ref):
    o_ref[...] = x_ref[...].T
x = jnp.ones((256, 256), jnp.float32)
out = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32)
)(x)
print("RESULT_OK", float(out[0, 0]))
""",
    "stride2_lane_slice": """
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
def k(x_ref, o_ref):
    o_ref[...] = x_ref[...][:, ::2]
x = jnp.ones((256, 512), jnp.float32)
out = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32)
)(x)
print("RESULT_OK", float(out[0, 0]))
""",
}


def main(timeout: int = 180) -> dict:
    results = {}
    for name, src in PROBES.items():
        try:
            p = subprocess.run(
                [sys.executable, "-c", src],
                capture_output=True, timeout=timeout, text=True,
                env=dict(os.environ, SPECENH_NO_COMPILE_CACHE="1"),
            )
            if p.returncode == 0 and "RESULT_OK" in p.stdout:
                results[name] = "OK"
            else:
                err = (p.stderr or p.stdout).strip().splitlines()
                results[name] = "FAIL: " + (err[-1][:160] if err else "?")
        except subprocess.TimeoutExpired:
            results[name] = f"HANG (> {timeout}s, killed)"
        print(f"{name}: {results[name]}", flush=True)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
