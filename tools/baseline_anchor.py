'''
Same-host CPU cross-check anchoring the A6000 throughput estimate (VERDICT round 1,
weak item #3): times one fwd+bwd of the SAME seeker (identical weights, shapes, fp32) in

  (a) the reference PyTorch stack (/root/reference model/seeker.py -> vendored TimeSformer)
  (b) this package's JAX step (tcow_tpu.models.mask_tracker, jitted, XLA CPU)

at a reduced geometry, on the same CPU. The torch/JAX step-time ratio is a hardware-
independent sanity bound on bench.py's FLOP-derived A6000 denominator: if JAX-on-CPU is
not slower than torch-on-CPU at identical math, the TPU-vs-A6000 speedup claim is not
inflated by framework overhead differences.

Usage: python tools/baseline_anchor.py [--repeats 3]
Writes one JSON line to stdout.
'''

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

# Large enough that GEMMs dominate (576 space-time tokens/clip); tiny shapes measure
# framework dispatch overhead rather than math throughput.
B, Q, T, H, W = 1, 1, 12, 96, 128
DEPTH = 12


def seeker_args():
    return dict(num_total_frames=T, num_visible_frames=T, frame_height=H, frame_width=W,
                tracker_pretrained=False, attention_type='divided_space_time',
                patch_size=16, causal_attention=1, norm_embeddings=False,
                drop_path_rate=0.0, network_depth=DEPTH, track_map_stride=4,
                track_map_resize='bilinear', query_channels=1, output_channels=3,
                flag_channels=3)


def time_torch(repeats: int):
    import numpy as np
    import torch
    import reference_oracle
    ref = reference_oracle.import_reference_pipeline()
    torch.manual_seed(0)
    net = ref.seeker.Seeker(reference_oracle.FakeRefLogger(), **seeker_args())
    net.train()
    rgb = torch.randn(B, 3, T, H, W)
    query = (torch.randn(B, 1, T, H, W) > 1.0).float()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}

    def step():
        out_mask, out_flags = net(rgb, query)
        loss = out_mask.square().mean() + out_flags.square().mean()
        net.zero_grad(set_to_none=True)
        loss.backward()
        return float(loss)

    step()  # warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    return min(times), sd, np.asarray(rgb), np.asarray(query)


def time_jax(repeats: int, sd, rgb_np, query_np):
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_platforms', 'cpu')
    from tcow_tpu.models import mask_tracker, torch_import
    from tcow_tpu.models.mask_tracker import seeker_config_from_args

    cfg = seeker_config_from_args(seeker_args(), compute_dtype=jnp.float32)
    params = torch_import.seeker_params_from_torch(sd, cfg)

    def loss_fn(p, rgb, query):
        out_mask, out_flags = mask_tracker.forward(p, cfg, rgb, query, train=False)
        return jnp.square(out_mask).mean() + jnp.square(out_flags).mean()

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    rgb = jnp.asarray(rgb_np)
    query = jnp.asarray(query_np)
    loss, grads = grad_fn(params, rgb, query)
    loss = float(loss)  # warmup + sync
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        l2, g2 = grad_fn(params, rgb, query)
        l2 = float(l2)
        _ = float(jax.tree_util.tree_leaves(g2)[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    return min(times), loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--repeats', type=int, default=3)
    args = ap.parse_args()

    torch_s, sd, rgb, query = time_torch(args.repeats)
    jax_s, jloss = time_jax(args.repeats, sd, rgb, query)
    print(json.dumps({
        'config': f'B{B} Q{Q} T{T} {H}x{W} depth{DEPTH} fp32 fwd+bwd, same CPU',
        'torch_ref_s': round(torch_s, 4),
        'jax_cpu_s': round(jax_s, 4),
        'torch_over_jax': round(torch_s / jax_s, 3),
    }))


if __name__ == '__main__':
    main()
