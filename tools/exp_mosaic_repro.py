"""Minimal Mosaic repro: in-kernel shape cast (8, 128, 4) -> (8, 512).

This is the operation the fused Pallas grouped-forward needs every step
(the grouped recursion reads (B,n)/(B,n/4,4)/(B,n/16,16) views of the
carried alpha; see PERFORMANCE.md "Known headroom").  Round-4 status:
Mosaic fails with 'infer-vector-layout: unsupported shape cast'.  Re-run
once per round — if this passes, the Pallas fused forward becomes the
only remaining path past the decode kernel's ~0.55 MFU cap, and is worth
re-attempting.

Usage: python tools/exp_mosaic_repro.py   (prints PASS/FAIL + the error)
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        x = x_ref[...]  # (8, 128, 4)
        o_ref[...] = x.reshape(8, 512)

    x = jnp.asarray(np.arange(8 * 128 * 4, dtype=np.float32).reshape(8, 128, 4))
    fn = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32)
    )
    try:
        out = np.asarray(fn(x))
    except Exception as e:
        print(f"FAIL: {type(e).__name__}: {str(e)[:500]}")
        return 1
    ok = np.array_equal(out, np.asarray(x).reshape(8, 512))
    print(f"PASS: shape cast compiled and ran; values {'ok' if ok else 'WRONG'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
