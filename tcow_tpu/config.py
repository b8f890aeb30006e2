'''
Flag-compatible argument system.

Mirrors /root/reference/args.py (shared_args :34-95, train_args :97-217, test_args :220-259,
verify_args :262-335) so the reference's documented train/eval commands run unchanged. TPU
additions are kept to a dedicated group (--mesh_devices, --seq_shards, --compute_dtype,
--remat) with defaults that preserve reference behavior.
'''

import argparse
import multiprocessing as mp
import os
from typing import Any, Dict


def _str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ('yes', 'true', 't', 'y', '1'):
        return True
    if v.lower() in ('no', 'false', 'f', 'n', '0'):
        return False
    raise argparse.ArgumentTypeError('Boolean value expected.')


def shared_args(parser: argparse.ArgumentParser):
    parser.add_argument('--seed', default=900, type=int)
    parser.add_argument('--log_level', default='info', type=str,
                        choices=['debug', 'info', 'warn'])
    parser.add_argument('--device', default='tpu', type=str,
                        choices=['tpu', 'cuda', 'cpu'],
                        help='Accelerator; cuda is accepted for reference-command '
                             'compatibility and treated as tpu.')
    parser.add_argument('--batch_size', default=4, type=int)
    parser.add_argument('--num_workers', default=-1, type=int)
    parser.add_argument('--worker_mode', default='thread', type=str,
                        choices=['thread', 'process'],
                        help='Data-loader workers: "thread" (few-core hosts / CI) or '
                             '"process" (fork pool; scales item loading with cores like '
                             'the reference\'s torch DataLoader workers).')
    parser.add_argument('--checkpoint_root', default='checkpoints/', type=str)
    parser.add_argument('--log_root', default='logs/', type=str)
    parser.add_argument('--name', '--tag', default='', type=str)
    parser.add_argument('--resume', '--checkpoint_name', default='', type=str)
    parser.add_argument('--epoch', default=-1, type=int)
    parser.add_argument('--avoid_wandb', default=0, type=int)
    parser.add_argument('--log_rarely', default=0, type=int)
    parser.add_argument('--data_path', required=True, type=str, nargs='+')
    parser.add_argument('--use_data_frac', default=1.0, type=float)
    parser.add_argument('--num_queries', default=1, type=int)
    # Automatically inferred options (do not assign).
    parser.add_argument('--is_debug', default=False, type=_str2bool)
    parser.add_argument('--checkpoint_path', default='', type=str)
    parser.add_argument('--train_log_path', default='', type=str)
    parser.add_argument('--log_path', default='', type=str)
    parser.add_argument('--wandb_group', default='group', type=str)
    # TPU-specific resource options.
    parser.add_argument('--mesh_devices', default=-1, type=int,
                        help='Number of devices in the mesh; -1 = all.')
    parser.add_argument('--seq_shards', default=1, type=int,
                        help='Sequence-parallel shards (second mesh axis).')
    parser.add_argument('--tp_shards', default=1, type=int,
                        help='Tensor-parallel shards (model mesh axis): block weights + '
                             'attention heads sharded, for models past one chip\'s HBM. '
                             'Composes with the fused Pallas kernel via the row-sharded '
                             'shard_map wrap (pallas_attention.fused_attention_rows).')
    parser.add_argument('--grad_accum', default=1, type=int,
                        help='Gradient accumulation: split the batch into this many '
                             'microbatches, run forward+backward per microbatch under '
                             'lax.scan, average gradients, apply ONE optimizer update — '
                             'emulates batches past one chip\'s HBM (e.g. --batch_size 4 '
                             '--grad_accum 2 on a 16 GB v5e). Must divide batch_size.')
    parser.add_argument('--pp_stages', default=1, type=int,
                        help='Pipeline-parallel stages (pipe mesh axis): the block stack '
                             'is split into contiguous stages and microbatches stream '
                             'through them GPipe-style (timesformer._gpipe_scan). '
                             'Requires network_depth %% (pp_stages * remat_group) == 0. '
                             'On (pipe x data)-only TPU meshes the manual-pipe schedule '
                             'keeps the fused Pallas attention (see --pp_manual); PP '
                             'composed with TP/SP uses the XLA attention path.')
    parser.add_argument('--pp_microbatches', default=0, type=int,
                        help='Microbatches for pipeline parallelism; 0 = pp_stages. Must '
                             'divide batch_size * num_queries.')
    parser.add_argument('--pp_manual', default=0, type=int,
                        help='Opt in to the manual-pipe schedule (explicit shard_map + '
                             'ppermute) on (pipe x data)-only TPU meshes so pipeline '
                             'parallelism keeps the fused Pallas attention kernel. '
                             'Gradient-exact vs the GSPMD path on the virtual mesh '
                             '(tests/test_pipeline_parallel.py) but never compiled on a '
                             'real multi-chip pod, so it stays opt-in; 0 (default) uses '
                             'the proven GSPMD GPipe path (XLA attention) everywhere.')
    parser.add_argument('--compute_dtype', default='bfloat16', type=str,
                        choices=['bfloat16', 'float32'])
    parser.add_argument('--profile_dir', default='', type=str,
                        help='If set, capture a jax.profiler trace of a few train steps '
                             'into this directory (view with xprof/tensorboard).')
    parser.add_argument('--device_augs', default=-1, type=int,
                        help='Color jitter on device inside the jitted step: -1 auto '
                             '(TPU on, else off), 0 host-side (reference behavior), 1 on.')
    parser.add_argument('--multihost', default=False, type=_str2bool,
                        help='Initialize jax.distributed for multi-host (DCN) execution; '
                             'coordinator/process env comes from the TPU runtime.')
    parser.add_argument('--h2d_prefetch', default=True, type=_str2bool,
                        help='Upload the NEXT batch to device while the current step '
                             'executes (one-deep host->device double buffering; costs one '
                             'extra device-resident batch). Hides the per-batch transfer '
                             'on slow links; harmless on fast PCIe.')


def train_args(argv=None):
    parser = argparse.ArgumentParser()
    shared_args(parser)
    parser.add_argument('--num_epochs', default=70, type=int)
    parser.add_argument('--checkpoint_every', default=2, type=int)
    parser.add_argument('--save_every', default=1, type=int,
                        help='Epoch interval for updating the latest checkpoint (the '
                             'reference saves every epoch; raise this when host<->device '
                             'bandwidth makes per-epoch state fetches expensive).')
    parser.add_argument('--preempt_save', default=True, type=_str2bool,
                        help='On SIGTERM (preemption/timeout), finish the current step, '
                             'write a FULL mid-epoch checkpoint, and exit cleanly; '
                             '--resume continues that epoch at the exact step.')
    parser.add_argument('--checkpoint_light', default=False, type=_str2bool,
                        help='Per-epoch saves fetch and write model params ONLY (~1/3 of '
                             'the bytes); the full resumable state (optimizer/rng/step) is '
                             'still written every checkpoint_every epochs and at the end. '
                             'Resuming from a light checkpoint reinitializes the optimizer.')
    parser.add_argument('--allow_opt_reinit', default=False, type=_str2bool,
                        help='Permit resuming training from a checkpoint WITHOUT optimizer '
                             'state (a --checkpoint_light save or a torch .pth), silently '
                             'reinitializing the AdamW moments/LR step. Off by default: '
                             'the driver instead falls back to the newest full-state '
                             'model_{e}.npz snapshot in the same directory, or refuses.')
    parser.add_argument('--learn_rate', default=1e-4, type=float)
    parser.add_argument('--lr_decay', default=0.3, type=float)
    parser.add_argument('--do_val_aug', default=True, type=_str2bool)
    parser.add_argument('--do_val_noaug', default=False, type=_str2bool)
    parser.add_argument('--val_every', default=2, type=int)
    parser.add_argument('--num_frames', default=24, type=int)
    parser.add_argument('--frame_height', default=240, type=int)
    parser.add_argument('--frame_width', default=320, type=int)
    parser.add_argument('--augs_2d', default=True, type=_str2bool)
    parser.add_argument('--kubric_frame_rate', default=12, type=int)
    parser.add_argument('--kubric_frame_stride', default=1, type=int)
    parser.add_argument('--kubric_max_delay', default=6, type=int)
    parser.add_argument('--kubric_reverse_prob', default=0.1, type=float)
    parser.add_argument('--kubric_palindrome_prob', default=0.1, type=float)
    parser.add_argument('--tracker_pretrained', default='1', type=str)
    parser.add_argument('--attention_type', default='divided_space_time', type=str,
                        choices=['divided_space_time', 'joint_space_time'])
    parser.add_argument('--patch_size', default=16, type=int)
    parser.add_argument('--causal_attention', default=1, type=int)
    parser.add_argument('--temporal_rope', default=0, type=int,
                        help='1: rotary (relative) time encoding on temporal attention — '
                             'windowed streaming then extrapolates past the trained '
                             'horizon without clamping time indices. New over the '
                             'reference; requires training with the flag on.')
    parser.add_argument('--rope_time_coords', default=0, type=int,
                        help='1 (with --temporal_rope): feed TRUE source-frame timestamps '
                             'into the rotary tables (time-calibrated rope) — strided / '
                             'subsampled clips (stride augs, plugin usage modes) carry '
                             'their real temporal spacing instead of pretending to be '
                             'contiguous. Stored in seeker_args.')
    parser.add_argument('--rope_time_stretch', default=1.0, type=float,
                        help='> 1 (train, with --rope_time_coords): scale each example\'s '
                             'rope time coordinates by a random log-uniform factor in '
                             '[1, S] — a pure coordinate augmentation exercising LONG '
                             'relative offsets for far-past-horizon streaming.')
    parser.add_argument('--norm_embeddings', default=False, type=_str2bool)
    parser.add_argument('--drop_path_rate', default=0.1, type=float)
    parser.add_argument('--network_depth', default=12, type=int)
    parser.add_argument('--seeker_frames', default=[-1], type=int, nargs='+')
    parser.add_argument('--seeker_query_time', default=0.0, type=float)
    parser.add_argument('--gradient_clip', default=0.3, type=float)
    parser.add_argument('--optimizer', default='adamw', type=str,
                        choices=['sgd', 'adam', 'adamw', 'lamb'])
    parser.add_argument('--track_lw', default=1.0, type=float)
    parser.add_argument('--occl_mask_lw', default=0.5, type=float)
    parser.add_argument('--cont_mask_lw', default=0.5, type=float)
    parser.add_argument('--occluded_weight', default=5.0, type=float)
    parser.add_argument('--occl_cont_zero_weight', default=0.02, type=float)
    parser.add_argument('--class_balancing', default=True, type=_str2bool)
    parser.add_argument('--focal_loss', default=False, type=_str2bool)
    parser.add_argument('--aot_loss', default=0.8, type=float)
    parser.add_argument('--hard_negative_factor', default=3.0, type=float)
    parser.add_argument('--front_occl_thres', default=0.95, type=float)
    parser.add_argument('--outer_cont_thres', default=0.75, type=float)
    parser.add_argument('--max_objects', default=36, type=int,
                        help='Static instance-axis pad M (36 = the reference datasets\' '
                             'bound, data_kubric.py:393-418). Datasets with fewer '
                             'instances can run a smaller M: the batch ships B*M*T*H*W/8 '
                             'packed mask bytes, so M=12 cuts that transfer (and the '
                             'collate memset) 3x. Scenes with more than M instances are '
                             'rejected at load time.')
    parser.add_argument('--remat', default=True, type=_str2bool,
                        help='Per-block rematerialization in the backward pass.')
    parser.add_argument('--remat_group', default=1, type=int,
                        help='Transformer blocks per checkpoint region (1 = per-block; '
                             'larger trades activation memory for less recompute).')
    args = parser.parse_args(argv)
    verify_args(args, is_train=True)
    return args


def test_args(argv=None):
    parser = argparse.ArgumentParser()
    shared_args(parser)
    parser.add_argument('--gpu_id', default=0, type=int)  # accepted, unused on TPU
    parser.add_argument('--plugin_frame_rate', default=30, type=int)
    parser.add_argument('--plugin_prefer_frame_stride', default=3, type=int)
    parser.add_argument('--center_crop', default=True, type=_str2bool)
    parser.add_argument('--store_results', default=False, type=_str2bool)
    parser.add_argument('--annots_must_exist', default=False, type=_str2bool)
    parser.add_argument('--extra_visuals', default=False, type=_str2bool)
    parser.add_argument('--stream_window', default=0, type=int,
                        help='>0: evaluate plugin videos by windowed STREAMING over every '
                             'frame (pinned query + ring KV cache of this many frames) '
                             'instead of usage-mode clip subsampling.')
    parser.add_argument('--plugin_batch', default=4, type=int,
                        help='Usage modes evaluated per device step for plugin videos '
                             '(batched multi-stride inference; the reference runs 1).')
    parser.add_argument('--test_device_batch', default=4, type=int,
                        help='Kubric test clips scored per device step (ONE batched '
                             'forward; per-clip losses/metrics/CSV rows preserved). The '
                             'reference forces 1 (args.py:276).')
    parser.add_argument('--test_log_path', default='', type=str)
    args = parser.parse_args(argv)
    verify_args(args, is_train=False)
    return args


def verify_args(args, is_train: bool = False):
    '''Post-parse derivation, mirroring args.py:262-335.'''
    if is_train and args.resume != '' and args.name == '':
        # Continue the SAME experiment. The reference requires an explicit --name next to
        # --resume (args.py:291-316 only resolves resume under a non-empty name; its
        # documented usage is bootstrap-into-a-new-name, '--resume v3 --name dbg4').
        # Without this default, `train.py --resume X` skips resume resolution entirely and
        # the driver crashes on np.load('X'); resuming under the resumed run's own name is
        # the only sensible reading of that command line. When --resume is a checkpoint
        # FILE path, the experiment name is the parent directory's basename (mirroring
        # the is_train=False branch below) — the raw file path would make
        # checkpoint_path/train_log_path point AT the file and makedirs would raise.
        if os.path.isfile(args.resume):
            args.name = os.path.basename(os.path.dirname(os.path.abspath(
                args.resume))) or 'resume'
        else:
            args.name = args.resume
    args.is_debug = args.name.startswith('d')
    args.wandb_group = ('train' if is_train else 'test') + \
                       ('_debug' if args.is_debug else '')

    if is_train:
        assert args.occl_cont_zero_weight < 0.5
    else:
        # The reference forces test batches to 1 clip (args.py:276) — a torch-memory
        # artifact, not a protocol requirement. Here K clips share one device step
        # (losses/metrics per-example inside the jitted step, so every clip's numbers
        # match the batch-1 protocol exactly); CSV rows stay per-clip.
        args.batch_size = max(1, int(getattr(args, 'test_device_batch', 4)))

    if args.num_workers < 0:
        if is_train:
            frac = 0.30 if args.is_debug else 0.45
            sub = 4 if args.is_debug else 6
            args.num_workers = max(int(mp.cpu_count() * frac) - sub, 4)
        else:
            args.num_workers = 4
        args.num_workers = min(args.num_workers, 80)
    args.num_workers = int(args.num_workers)

    if args.name != '':
        if args.resume != '':
            resume_name = args.resume
            from tcow_tpu.train import checkpoint as ckpt_lib
            args.resume = ckpt_lib.resolve_resume_path(
                args.checkpoint_root, args.resume, args.epoch)

        if is_train:
            args.checkpoint_path = os.path.join(args.checkpoint_root, args.name)
            args.train_log_path = os.path.join(args.log_root, args.name)
            os.makedirs(args.checkpoint_path, exist_ok=True)
            os.makedirs(args.train_log_path, exist_ok=True)
            args.log_path = args.train_log_path
        else:
            assert args.resume != ''
            if os.path.isfile(resume_name):
                # Extension over the reference: --resume may be a checkpoint file path;
                # log under the experiment directory's name.
                resume_name = os.path.basename(os.path.dirname(os.path.abspath(
                    resume_name))) or 'resume'
            args.checkpoint_path = os.path.join(args.checkpoint_root, resume_name)
            args.train_log_path = os.path.join(args.log_root, resume_name)
            os.makedirs(args.train_log_path, exist_ok=True)
            from tcow_tpu.train import checkpoint as ckpt_lib
            epoch = ckpt_lib.get_checkpoint_epoch(args.resume)
            args.name += f'_e{epoch}'
            args.test_log_path = os.path.join(args.train_log_path, 'test_' + args.name)
            args.log_path = args.test_log_path
            os.makedirs(args.test_log_path, exist_ok=True)


def args_to_dict(args) -> Dict[str, Any]:
    return {k: v for k, v in vars(args).items()}


def build_seeker_args(args) -> Dict[str, Any]:
    '''The seeker_args dict embedded in checkpoints (train.py:186-206).'''
    max_seeker_frames = max(args.seeker_frames)
    if max_seeker_frames < 0 or max_seeker_frames > args.num_frames:
        max_seeker_frames = args.num_frames
    return dict(
        num_total_frames=args.num_frames,
        num_visible_frames=max_seeker_frames,
        frame_height=args.frame_height,
        frame_width=args.frame_width,
        tracker_pretrained=args.tracker_pretrained,
        attention_type=args.attention_type,
        patch_size=args.patch_size,
        causal_attention=args.causal_attention,
        temporal_rope=int(getattr(args, 'temporal_rope', 0)),
        rope_time_coords=int(getattr(args, 'rope_time_coords', 0)),
        norm_embeddings=args.norm_embeddings,
        drop_path_rate=args.drop_path_rate,
        network_depth=args.network_depth,
        track_map_stride=4,
        track_map_resize='bilinear',
        query_channels=1,
        output_channels=3,
        flag_channels=3,
    )
