'''
Decision probe for the NEXT.md "fp8 projection GEMMs" experiment (VERDICT r2, task 8).

Measures sustained dot_general throughput on the real chip at the fused attention
kernel's projection-GEMM geometry ((rows, D) x (D, 3D) qkv + (rows, D) x (D, D) proj,
flagship D=1024, rows = B*Q*N*T_pad) for: bf16 x bf16 -> f32 (the shipped path),
fp8 e4m3 x e4m3 -> f32, fp8 e5m2, and int8 x int8 -> int32. If low-precision GEMMs do
not beat bf16 by >= the accept bar (3% of step time ~= >= 1.5x on these GEMMs, which are
~15% of the step), the experiment is rejected on measurement per NEXT.md protocol.

Timing per CLAUDE.md TPU-via-axon rules: chain N calls inside one jit (carry-dependent so
XLA cannot elide), sync once by fetching a scalar.
'''

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rows', type=int, default=18432,
                    help='flagship temporal-call rows: B*Q(6 folded)*N(100)*T_pad(32)'
                         ' ~= 19200; rounded to an MXU-friendly 18432 by default')
    ap.add_argument('--d', type=int, default=1024)
    ap.add_argument('--iters', type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    R, D = args.rows, args.d
    flops_qkv = 2 * R * D * 3 * D
    flops_proj = 2 * R * D * D
    flops = flops_qkv + flops_proj

    def bench(dtype, acc_dtype):
        x = jnp.asarray(np.random.randn(R, D) * 0.1).astype(dtype)
        w1 = jnp.asarray(np.random.randn(D, 3 * D) * 0.1).astype(dtype)
        w2 = jnp.asarray(np.random.randn(D, D) * 0.1).astype(dtype)

        @jax.jit
        def run(x, w1, w2):
            def body(c, _):
                q = jax.lax.dot_general(c, w1, (((1,), (0,)), ((), ())),
                                        preferred_element_type=acc_dtype)
                o = jax.lax.dot_general(q[:, :D].astype(dtype), w2,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=acc_dtype)
                # feed the output back (cast) so the chain is data-dependent
                return o.astype(dtype), ()
            c, _ = jax.lax.scan(body, x, None, length=args.iters)
            return c.astype(jnp.float32).sum()

        s = run(x, w1, w2)          # compile + warm
        float(s)
        t0 = time.time()
        s = run(x, w1, w2)
        float(s)                    # scalar fetch = the only reliable sync over axon
        dt = (time.time() - t0) / args.iters
        return dt, flops / dt / 1e12

    results = {}
    for name, dtype, acc in [
            ('bf16', jnp.bfloat16, jnp.float32),
            ('fp8_e4m3', jnp.float8_e4m3fn, jnp.float32),
            ('fp8_e5m2', jnp.float8_e5m2, jnp.float32),
            ('int8', jnp.int8, jnp.int32)]:
        try:
            dt, tf = bench(dtype, acc)
            results[name] = (dt, tf)
            print(f'{name:10s}: {dt * 1e3:7.3f} ms/iter  {tf:6.1f} TFLOP/s')
        except Exception as e:  # unsupported dtype lowering etc.
            results[name] = None
            print(f'{name:10s}: FAILED ({type(e).__name__}: {str(e)[:120]})')

    if results.get('bf16') and any(v and v[1] > results['bf16'][1] * 1.3
                                   for k, v in results.items() if k != 'bf16'):
        print('VERDICT: low-precision GEMM shows a >=1.3x win — worth kernel integration')
    else:
        print('VERDICT: no meaningful low-precision GEMM win at this geometry — reject '
              '(record in NEXT.md)')


if __name__ == '__main__':
    main()
