"""Chip compute-ceiling calibration: big bf16 matmul TFLOP/s with the honest
timing methodology (loop inside jit over per-iter perturbed operands + host
readback). Used to put the GAR renders/s numbers in MFU terms (README).

NOTE an earlier revision fed a ``(iters, 8, n, n)`` operand stack (8.6 GB —
far over the slice's HBM), which silently measured host paging through the
tunnel and reported ~9.6 TFLOP/s. Keeping the operands resident and varying
them with a scalar perturbation measures the real MXU rate (~121 TFLOP/s on
the dev slice, ~61% of a stock v5e's 197).

python benchmarks/bench_matmul.py
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp


def main(n: int = 4096, iters: int = 32):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(k1, (8, n, n), jnp.bfloat16)
    b = jax.random.normal(k2, (n, n), jnp.bfloat16)

    @jax.jit
    def many(a, b, deltas):
        def body(acc, d):
            c = jnp.einsum("gij,jk->gik", a + d.astype(a.dtype), b,
                           preferred_element_type=jnp.float32)
            return acc + jnp.mean(c), None  # full reduction: DCE-safe

        return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            deltas)[0]

    deltas = jax.random.normal(jax.random.PRNGKey(9), (iters,)) * 1e-3
    float(np.asarray(many(a, b, deltas)))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(many(a, b, deltas)))  # readback = the only barrier
    dt = time.perf_counter() - t0
    flops = 2 * 8 * n * n * n * iters
    print(f"bf16 {8}x{n}^3 matmul: {flops / dt / 1e12:.1f} TFLOP/s "
          f"({dt / iters * 1e3:.2f} ms/iter)")


if __name__ == "__main__":
    main(*(int(x) for x in sys.argv[1:3]))
