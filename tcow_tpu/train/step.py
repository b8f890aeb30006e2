'''
The jitted training / evaluation step: supervision building + forward + losses + metrics +
gradients + optimizer update compiled into ONE XLA program, data-parallel over the mesh.

Replaces the reference's per-query python loop (pipeline.py:134-174) with a folded (B*Q)
batch, its GPU-0 loss reduction (train.py:64-102) with SPMD all-reduce, and its NaN-skip
logic (train.py:91-92) with a lax-select on loss finiteness.

Batch schema (all static shapes; instance axis padded to M, SURVEY.md section 7.3):
  rgb           (B, 3, T, H, W) float32  (or uint8 'rgb_u8': normalized on device)
  segm          (B, T, H, W)    int32   1-based visible instance IDs
  div_segm      (B, M, T, H, W) uint8   amodal masks (or bit-packed 'div_segm_packed'
                                        (B, M, T, H, W//8): unpacked on device — the masks
                                        dominate host->device transfer otherwise)
  query_inds    (B, Q)          int32   host-sampled query instance indices
  query_time    ()              int32   shared query frame index
  occl_fracs    (B, M, T, 3)    float32
  occl_cont_dag (B, T, M, M, 3) float32
  frame_times   (B, T)          float32 optional: TRUE source timestamps of the clip
                                frames (time-calibrated rope; consumed only when
                                seeker.rope_time_coords is set)
'''

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from tcow_tpu.models import mask_tracker
from tcow_tpu.models.mask_tracker import SeekerConfig
from tcow_tpu.objectives import losses as losses_lib
from tcow_tpu.objectives import metrics as metrics_lib
from tcow_tpu.objectives import supervision
from tcow_tpu.objectives.losses import LossConfig


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    rng: jax.Array
    step: jnp.ndarray  # int32 scalar


@dataclasses.dataclass(frozen=True)
class StepConfig:
    seeker: SeekerConfig  # set seeker.remat=True for training at full size
    loss: LossConfig
    num_queries: int = 3


def init_train_state(rng: jax.Array, cfg: StepConfig,
                     tx: optax.GradientTransformation,
                     params: Optional[Any] = None) -> TrainState:
    k_init, k_state = jax.random.split(rng)
    if params is None:
        params = mask_tracker.init_params(k_init, cfg.seeker)
    return TrainState(params=params, opt_state=tx.init(params), rng=k_state,
                      step=jnp.int32(0))


def _forward_queries(params, cfg: StepConfig, batch, sup, train: bool, rng):
    '''Runs the seeker on all (example, query) pairs as one folded batch.
    Returns output_mask (B, Q, C, T, H, W) and output_flags (B, Q, T, F).'''
    B, Q = batch['query_inds'].shape
    rgb = batch['rgb']
    _, _, T, H, W = rgb.shape
    rgb_q = jnp.broadcast_to(rgb[:, None], (B, Q) + rgb.shape[1:])
    rgb_q = rgb_q.reshape(B * Q, 3, T, H, W)
    qmask = sup['seeker_query_mask'].reshape(B * Q, 1, T, H, W)

    frame_times = None
    if cfg.seeker.rope_time_coords and 'frame_times' in batch:
        # (B, T) true source timestamps -> every query of an example shares its clock.
        frame_times = jnp.broadcast_to(batch['frame_times'][:, None],
                                       (B, Q, T)).reshape(B * Q, T)
    out_mask, out_flags = mask_tracker.forward(params, cfg.seeker, rgb_q, qmask,
                                               train=train, rng=rng,
                                               frame_times=frame_times)
    C = cfg.seeker.output_channels
    out_mask = out_mask.reshape(B, Q, C, T, H, W)
    if out_flags is not None:
        out_flags = out_flags.reshape(B, Q, T, -1)
    return out_mask, out_flags


def unpack_batch(batch) -> Dict[str, Any]:
    '''Expands on-device the compact transfer forms: bit-packed amodal masks and uint8 rgb
    (cuts host->device bytes ~7x; the packing happens in the collate).'''
    batch = dict(batch)
    if 'div_segm_packed' in batch:
        packed = batch.pop('div_segm_packed')                  # (B, M, T, H, W//8) uint8
        shifts = (7 - jnp.arange(8, dtype=jnp.uint8))          # np.packbits is big-endian
        bits = (packed[..., None] >> shifts) & jnp.uint8(1)
        batch['div_segm'] = bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)
    if 'rgb_u8' in batch:
        batch['rgb'] = batch.pop('rgb_u8').astype(jnp.float32) / 255.0
    if 'segm_u8' in batch:
        batch['segm'] = batch.pop('segm_u8').astype(jnp.int32)
    if 'jitter_factors' in batch:
        # Deferred color jitter: the host only sampled factors; the pixel math fuses into
        # this unpacking pass on device (ops/device_augs.py; cuts ~0.56 s/item host cost).
        from tcow_tpu.ops import device_augs
        batch['rgb'] = device_augs.apply_color_jitter(
            batch['rgb'], batch.pop('jitter_factors'), batch.pop('jitter_order'))
    if 'blur_gray' in batch:
        # Deferred blur + grayscale (the tail of the host color chain; applied after the
        # jitter like the reference order, /root/reference/data/augs.py:116-119).
        from tcow_tpu.ops import device_augs
        batch['rgb'] = device_augs.apply_blur_gray(batch['rgb'],
                                                   batch.pop('blur_gray'))
    return batch


def build_supervision(cfg: StepConfig, batch) -> Dict[str, jnp.ndarray]:
    return supervision.fill_query_target_batch(
        batch['segm'], batch['div_segm'], batch['query_inds'], batch['query_time'],
        batch['occl_fracs'], batch['occl_cont_dag'],
        front_occl_thres=cfg.loss.front_occl_thres,
        outer_cont_thres=cfg.loss.outer_cont_thres)


def _loss_and_aux(params, cfg: StepConfig, batch, rng, progress, train: bool):
    batch = unpack_batch(batch)
    sup = build_supervision(cfg, batch)
    out_mask, out_flags = _forward_queries(params, cfg, batch, sup, train, rng)

    # (B, Q, T, 3) occlusion fractions of the selected queries (pipeline.py:164-165).
    sel_occl_fracs = jax.vmap(lambda of, qi: of[qi])(batch['occl_fracs'],
                                                     batch['query_inds'])
    loss_retval = losses_lib.compute_losses(
        cfg.loss, out_mask, sup['target_mask'], sel_occl_fracs,
        sup['snitch_occl_by_ptr'], batch['query_time'], progress)
    msums = metrics_lib.mask_track_metric_sums(out_mask, sup['target_mask'])

    aux = {
        'track': loss_retval['track'],
        'occl_mask': loss_retval['occl_mask'],
        'cont_mask': loss_retval['cont_mask'],
        'total_seeker': loss_retval['total_seeker'],
        'metric_sums': msums,
    }
    return loss_retval['total_seeker'], aux


def make_train_step(cfg: StepConfig, tx: optax.GradientTransformation,
                    donate: bool = True, grad_accum: int = 1):
    '''Returns train_step(state, batch, progress) -> (state, scalars_dict), jittable.

    grad_accum > 1 splits the batch into `grad_accum` equal microbatches, runs
    forward+backward per microbatch under lax.scan (so only ONE microbatch's activations
    are ever live), averages the gradients, and applies a single optimizer update —
    emulating a batch that exceeds one chip's HBM (B=4 at the flagship config compiles to
    20.1 GB > 15.75 GB; B=2 microbatches fit, the f32 grad accumulator adds ~0.5 GB).
    Semantics: each microbatch's losses are its own batch-global masked means (class
    balancing, top-k bootstrap, selection-count normalizers — losses.py), so the averaged
    gradient equals a true large batch only up to those per-microbatch normalizers — the
    same deviation every per-device-loss DDP setup has; trajectory equivalence is tested
    in tests/test_grad_accum.py. Batch-coupled leaves with a leading batch dim are split;
    scalars (query_time) are shared. Under a data-parallel mesh the microbatch slice
    keeps the batch sharding (B/grad_accum must still divide the data-axis size).'''
    A = max(1, int(grad_accum))

    def train_step(state: TrainState, batch, progress):
        rng, rng_dp = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(_loss_and_aux, has_aux=True)
        if A == 1:
            (loss, aux), grads = grad_fn(state.params, cfg, batch, rng_dp, progress,
                                         True)
        else:
            split, shared = {}, {}
            for k, v in batch.items():
                if getattr(v, 'ndim', 0) > 0:
                    assert v.shape[0] % A == 0, (k, v.shape, A)
                    split[k] = v.reshape((A, v.shape[0] // A) + v.shape[1:])
                else:
                    shared[k] = v
            rngs = jax.random.split(rng_dp, A)

            def one(rng_i, batch_i):
                return grad_fn(state.params, cfg, {**batch_i, **shared}, rng_i,
                               progress, True)

            # Microbatch 0 runs standalone to seed the accumulator with the right pytree
            # structure; 1..A-1 stream through a scan accumulating sums in place.
            (loss0, aux0), g0 = one(rngs[0], {k: v[0] for k, v in split.items()})

            def body(acc, xs):
                rng_i, batch_i = xs
                (l, a), g = one(rng_i, batch_i)
                l_acc, a_acc, g_acc = acc
                return (l_acc + l, jax.tree_util.tree_map(jnp.add, a_acc, a),
                        jax.tree_util.tree_map(jnp.add, g_acc, g)), None

            (loss_sum, aux_sum, grad_sum), _ = jax.lax.scan(
                body, (loss0, aux0, g0),
                (rngs[1:], {k: v[1:] for k, v in split.items()}))
            inv = jnp.float32(1.0 / A)
            loss = loss_sum * inv
            grads = jax.tree_util.tree_map(lambda g: g * inv, grad_sum)
            # metric_sums are COUNTS (masked sums) — keep summed; scalar losses average.
            aux = {k: (v if k == 'metric_sums'
                       else jax.tree_util.tree_map(lambda x: x * inv, v))
                   for k, v in aux_sum.items()}

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # Skip the update entirely on non-finite loss (train.py:91-92).
        ok = jnp.isfinite(loss)
        sel = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new, old)
        new_state = TrainState(params=sel(new_params, state.params),
                               opt_state=sel(new_opt_state, state.opt_state),
                               rng=rng, step=state.step + 1)
        aux = dict(aux)
        aux['skipped_nonfinite'] = (~ok).astype(jnp.float32)
        aux['grad_norm'] = optax.global_norm(grads)
        return new_state, aux

    return train_step


def make_eval_step(cfg: StepConfig, return_outputs: bool = False,
                   per_example: bool = False):
    '''Returns eval_step(params, batch, progress) -> scalars dict (losses + metric sums);
    no gradients, no dropout/drop-path. With return_outputs, the dict also carries the
    output/target/query mask arrays for visualization and itemized evaluation.

    per_example (implies return_outputs): the ONE batched forward is shared, but losses
    and metric sums are computed per example via vmap over B=1 slices — each clip's
    numbers are then EXACTLY what the reference's forced batch-1 protocol
    (/root/reference/args.py:276) produces, while the device step amortizes K clips
    (batched kubric evaluation; every scalar in the result has a leading B axis).'''

    def eval_step(params, batch, progress):
        if not (return_outputs or per_example):
            _, aux = _loss_and_aux(params, cfg, batch, None, progress, False)
            return aux
        batch = unpack_batch(batch)
        sup = build_supervision(cfg, batch)
        out_mask, out_flags = _forward_queries(params, cfg, batch, sup, False, None)
        sel_occl_fracs = jax.vmap(lambda of, qi: of[qi])(batch['occl_fracs'],
                                                         batch['query_inds'])
        if per_example:
            def one(om, tm, of, sp):
                lr = losses_lib.compute_losses(cfg.loss, om[None], tm[None], of[None],
                                               sp[None], batch['query_time'], progress)
                ms = metrics_lib.mask_track_metric_sums(om[None], tm[None])
                return lr, ms
            lr_b, msums = jax.vmap(one)(out_mask, sup['target_mask'], sel_occl_fracs,
                                        sup['snitch_occl_by_ptr'])
            loss_retval = lr_b
            sw = lr_b.get('snitch_weights')
            # vmap stacks the per-example (1, Q, T, H, W) weights -> drop the dummy axis.
            snitch_weights = None if sw is None else sw[:, 0]
        else:
            loss_retval = losses_lib.compute_losses(
                cfg.loss, out_mask, sup['target_mask'], sel_occl_fracs,
                sup['snitch_occl_by_ptr'], batch['query_time'], progress)
            msums = metrics_lib.mask_track_metric_sums(out_mask, sup['target_mask'])
            snitch_weights = loss_retval.get('snitch_weights')
        return {
            'track': loss_retval['track'], 'occl_mask': loss_retval['occl_mask'],
            'cont_mask': loss_retval['cont_mask'],
            'total_seeker': loss_retval['total_seeker'],
            'metric_sums': msums,
            'output_mask': out_mask, 'output_flags': out_flags,
            'target_mask': sup['target_mask'],
            'seeker_query_mask': sup['seeker_query_mask'],
            'snitch_weights': snitch_weights,
        }

    return eval_step


def make_vis_step(cfg: StepConfig, max_queries: int = 2):
    '''Compact payload for train-time overlay rendering (the reference renders overlays
    from the training forward's outputs every step_interval steps, train.py:74 ->
    logvis.py:176-308). The jitted train step never materializes per-pixel outputs on
    host, so visualization runs this separate eval forward at interval steps.

    The batch is sliced to EXAMPLE 0 on device before the forward (only example 0 is ever
    rendered; running the full B*Q eval forward just to discard it would cost ~B x more),
    so the loss/metric scalars in the payload are example-0 values — per-batch scalars
    come from the train step itself. The payload carries the UNPACKED, device-augmented
    rgb ('seeker_rgb'): with --device_augs the host-side rgb is pre-jitter, and overlays
    must show the frames the model actually saw. Everything per-pixel arrives as float16
    slices (first max_queries queries) to keep the host fetch small.

    Pipeline parallelism is disabled for this forward: the example-0 slice shrinks the
    backbone batch to 1*num_queries, which generally does not divide pp_microbatches
    (e.g. --num_queries 1 with --pp_stages 2) — _gpipe_scan would assert on every overlay
    render. The sequential scan is the same math, so overlays are exact regardless.'''
    if cfg.seeker.pp_stages > 1:
        cfg = dataclasses.replace(
            cfg, seeker=dataclasses.replace(cfg.seeker, pp_stages=1, pp_microbatches=0,
                                            pipe_axis=None))
    eval_step = make_eval_step(cfg, return_outputs=True)

    def vis_step(params, batch, progress):
        batch = {k: (v[0:1] if getattr(v, 'ndim', 0) > 0 else v)
                 for k, v in batch.items()}
        # Unpack once: the result is a valid eval_step input (no packed/jitter keys left),
        # so the decode + device-jitter work is not traced twice.
        batch = unpack_batch(batch)
        rgb = batch['rgb']
        out = eval_step(params, batch, progress)
        f16 = lambda x: None if x is None else x[0:1, :max_queries].astype(jnp.float16)
        return {
            'track': out['track'], 'occl_mask': out['occl_mask'],
            'cont_mask': out['cont_mask'], 'total_seeker': out['total_seeker'],
            'metric_sums': out['metric_sums'],
            'seeker_rgb': rgb[0:1].astype(jnp.float16),
            'output_mask': f16(out['output_mask']),
            'target_mask': f16(out['target_mask']),
            'seeker_query_mask': f16(out['seeker_query_mask']),
            'snitch_weights': f16(out.get('snitch_weights')),
        }

    return vis_step


def make_inference_step(cfg: SeekerConfig):
    '''Plugin-style inference: (params, rgb (B,3,T,H,W), query (B,1,T,H,W)[, frame_times
    (B,T)]) -> (mask logits (B,3,T,H,W), flags (B,T,F)). Matches the reference
    forward_plugin (pipeline.py:202-240); frame_times carries the usage mode's true
    source-frame spacing for time-calibrated rope checkpoints.'''

    def infer(params, rgb, query, frame_times=None):
        return mask_tracker.forward(params, cfg, rgb, query, train=False,
                                    frame_times=frame_times)

    return infer
