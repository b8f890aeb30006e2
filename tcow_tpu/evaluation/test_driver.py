'''
Evaluation driver.

Reimplements /root/reference/eval/test.py:23-210: outer loop over data paths (one loader at
a time to bound memory), per-step inference + metrics, itemized_results.csv export, weighted
vs unweighted aggregation with the self-check that recomputes both from the exported
DataFrame (test.py:140-152), optional result pickling (--store_results), and the
pick_represent-compatible friendly_short_name bookkeeping.
'''

import os
import time
from typing import Any, Dict, List

import numpy as np
import pandas as pd

from tcow_tpu.data import data_utils, factory
from tcow_tpu.evaluation import inference as inference_lib
from tcow_tpu.objectives import metrics as metrics_lib
from tcow_tpu.train import driver as train_driver


def test_results_to_dataframe(inference_retvals: List[Dict]) -> pd.DataFrame:
    '''metrics.py:166-191 schema.'''
    rows = []
    for r in inference_retvals:
        row = {
            'source': r['source_name'],
            'dset_idx': r['dset_idx'],
            'scene_idx': r['scene_idx'],
        }
        if 'scene_dn' in r:
            row['scene_dn'] = r['scene_dn']
        row['friendly_short_name'] = r['friendly_short_name']
        for k, v in r['loss_retval'].items():
            if 'metrics' not in k:
                row['loss_' + k] = v
        row.update(r['loss_retval']['metrics'])
        rows.append(row)
    return pd.DataFrame(rows)


def _pad_device_batch(device_batch: Dict[str, Any], to: int) -> Dict[str, Any]:
    '''Pads a tail batch to the full device batch size by repeating the last clip
    (keeps ONE compiled shape across the run; padded rows are dropped via `valid`).'''
    out = {}
    for k, v in device_batch.items():
        if getattr(v, 'ndim', 0) > 0 and v.shape[0] < to:
            reps = np.repeat(v[-1:], to - v.shape[0], axis=0)
            out[k] = np.concatenate([v, reps], axis=0)
        else:
            out[k] = v
    return out


def _test_inner_kubric(all_args, engine, loader, logger, step_offset):
    '''Batched kubric evaluation: the loader yields K clips per batch, ONE jitted device
    step scores all of them, and per-clip CSV rows / friendly names / pickles are emitted
    exactly as the reference's clip-at-a-time protocol would (per-example losses inside
    the step — see InferenceEngine.run_kubric).'''
    retvals = []
    start_time = time.time()
    device_bs = max(1, loader.batch_size)
    real_step = step_offset
    for cur_step, batch in enumerate(loader):
        if cur_step == 0:
            logger.info(f'Enter first data loader iteration took '
                        f'{time.time() - start_time:.3f}s')
        meta = batch['meta']
        n_valid = len(meta['scene_idx'])
        device_batch = batch['device']
        if n_valid < device_bs:
            device_batch = _pad_device_batch(device_batch, device_bs)
        for j, (model_retval, loss_retval) in enumerate(
                engine.run_kubric(device_batch, valid=n_valid)):
            retval = {
                'source_name': 'kubric',
                'dset_idx': int(meta['dset_idx'][j]),
                'scene_idx': int(meta['scene_idx'][j]),
                'scene_dn': meta['scene_dn'][j],
                'loss_retval': loss_retval,
                'model_retval': model_retval,
            }
            retval['friendly_short_name'] = logger.handle_test_step(
                real_step, {'source_name': 'kubric', 'scene_dn': retval['scene_dn'],
                            'dset_idx': retval['dset_idx']},
                model_retval, loss_retval)
            if all_args['test'].store_results:
                logger.save_pickle(
                    {k: v for k, v in retval.items() if k != 'model_retval'},
                    f'results/inference_retval_s{real_step}.p')
            retval.pop('model_retval')
            retvals.append(retval)
            real_step += 1
    return retvals


def _test_inner_plugin(all_args, engine, dataset, logger, step_offset):
    retvals = []
    n = len(dataset)
    plugin_batch = max(1, getattr(all_args['test'], 'plugin_batch', 4))
    for i0 in range(0, n, plugin_batch):
        # Materialize one chunk at a time (each item is a full decoded clip).
        chunk = [dataset[i] for i in range(i0, min(i0 + plugin_batch, n))]
        rgb = np.stack([it['rgb'] for it in chunk])
        query = np.stack([it['query'] for it in chunk])
        target = np.stack([it['target'] for it in chunk])
        # True source-frame indices of each usage mode (time-calibrated rope checkpoints).
        frame_times = (np.stack([it['frame_inds'] for it in chunk]).astype(np.float32)
                       if 'frame_inds' in chunk[0] else None)
        for j, (model_retval, loss_retval) in enumerate(
                engine.run_plugin(rgb, query, target, frame_times=frame_times)):
            it = chunk[j]
            real_step = i0 + j + step_offset
            retval = {
                'source_name': 'plugin',
                'dset_idx': int(it['dset_idx']),
                'scene_idx': int(it['scene_idx']),
                'loss_retval': loss_retval,
            }
            retval['friendly_short_name'] = logger.handle_test_step(
                real_step, it, model_retval, loss_retval)
            if all_args['test'].store_results:
                logger.save_pickle(retval, f'results/inference_retval_s{real_step}.p')
            retvals.append(retval)
    return retvals


def _test_inner_plugin_stream(all_args, engine, dataset, logger, step_offset,
                              window: int):
    '''Streaming evaluation of a plugin video: windowed KV-cached inference over EVERY
    frame (no usage-mode subsampling), scored at the annotated frames. One retval per
    video (new capability over the reference's clip protocol).'''
    ex = dataset.get_streaming_example()
    model_retval, loss_retval = engine.run_plugin_stream(ex, window=window)
    retval = {
        'source_name': 'plugin',
        'dset_idx': 0,
        'scene_idx': 0,
        'loss_retval': loss_retval,
    }
    data_retval = {k: ex[k] for k in ('source_name', 'src_path', 'dset_idx', 'scene_idx',
                                      'frame_start', 'frame_stride')}
    data_retval['frame_stride'] = 0  # marks the streaming protocol in friendly names
    retval['friendly_short_name'] = logger.handle_test_step(
        step_offset, data_retval, model_retval, loss_retval)
    if all_args['test'].store_results:
        logger.save_pickle(retval, f'results/inference_retval_s{step_offset}.p')
    return [retval]


def _test_postprocess(inference_retvals, logger):
    '''Aggregation + CSV export + self-check (test.py:121-163).'''
    metrics_retvals = [r['loss_retval']['metrics'] for r in inference_retvals]
    final_weighted = metrics_lib.calculate_weighted_averages(metrics_retvals)
    final_unweighted = metrics_lib.calculate_unweighted_averages(metrics_retvals)

    logger.info('')
    for k in sorted(metrics_lib.METRIC_KEYS):
        logger.info(f'unweighted_mean_{k} (over {len(metrics_retvals)} scenes): '
                    f'{final_unweighted[f"mean_{k}"]:.5f}')
    logger.info('')
    for k in sorted(metrics_lib.METRIC_KEYS):
        logger.info(f'weighted_mean_{k} (over {final_weighted[f"count_{k}"]:.0f} frames): '
                    f'{final_weighted[f"mean_{k}"]:.5f}')

    for k in sorted(metrics_lib.METRIC_KEYS):  # wandb run-summary values (test.py:126)
        logger.report_single_scalar(f'weighted_mean_{k}', final_weighted[f'mean_{k}'])
        logger.report_single_scalar(f'unweighted_mean_{k}', final_unweighted[f'mean_{k}'])

    df = test_results_to_dataframe(inference_retvals)
    csv_fp = os.path.join(logger.log_dir, 'itemized_results.csv')
    df.to_csv(csv_fp)
    logger.info(f'Exported quantitative results to: {csv_fp}')

    # Self-check: aggregates recomputed from the CSV must match (test.py:140-152).
    verify_w = calculate_weighted_averages_dataframe(df)
    verify_u = calculate_unweighted_averages_dataframe(df)
    for k, v in verify_w.items():
        if not (np.isnan(v) or np.isnan(final_weighted[k])):
            if not np.isclose(v, final_weighted[k]):
                logger.error(f'Weighted metric {k} does not match! '
                             f'{v} vs {final_weighted[k]}')
    for k, v in verify_u.items():
        if not (np.isnan(v) or np.isnan(final_unweighted[k])):
            if not np.isclose(v, final_unweighted[k]):
                logger.error(f'Unweighted metric {k} does not match! '
                             f'{v} vs {final_unweighted[k]}')
    if len(inference_retvals) >= 20:
        logger.warning('Metrics here cover ALL sampled clips; for the paper protocol run '
                       'pick_represent for a balanced evaluation (README).')
    return final_weighted, final_unweighted, df


def calculate_weighted_averages_dataframe(csv: pd.DataFrame) -> Dict[str, float]:
    '''metrics.py:194-216.'''
    out = {}
    for k in csv.columns:
        if 'count' in k:
            counts = np.array(csv[k], np.float64)
            means = np.array(csv[k.replace('count', 'mean')], np.float64)
            n = counts.sum()
            out[k] = n
            out[k.replace('count', 'mean')] = \
                float((means * counts).sum() / (n + 1e-7)) if n > 0 else -1.0
    return out


def calculate_unweighted_averages_dataframe(csv: pd.DataFrame, exclude_value=-1.0
                                            ) -> Dict[str, float]:
    '''metrics.py:219-240.'''
    out = {}
    for k in csv.columns:
        if 'count' in k:
            vals = np.array(csv[k.replace('count', 'mean')], np.float64)
            filt = vals[vals != exclude_value]
            out[k] = len(filt)
            out[k.replace('count', 'mean')] = float(filt.mean()) if len(filt) else float('nan')
    return out


def main(test_args, logger):
    import jax.numpy as jnp
    logger.save_args(test_args, 'test')
    np.random.seed(test_args.seed)

    avoid_wandb = int(getattr(test_args, 'avoid_wandb', 0))
    if avoid_wandb < 2:
        logger.init_wandb('tcow', test_args, name=test_args.name or None,
                          group=getattr(test_args, 'wandb_group', 'test'))
    logger.log_media_online = (avoid_wandb == 0)
    logger.extra_visuals = bool(getattr(test_args, 'extra_visuals', False))

    logger.info('Initializing model...')
    compute_dtype = jnp.bfloat16 if test_args.compute_dtype == 'bfloat16' else jnp.float32
    params, cfg, train_args, train_dset_args, seeker_args, epoch = \
        inference_lib.load_networks(test_args.resume, logger, epoch=test_args.epoch,
                                    compute_dtype=compute_dtype)

    # Loss config comes from the stored train args (defaults where missing).
    loss_cfg = train_driver.loss_config_from_args(_DictNS(train_args))
    engine = inference_lib.InferenceEngine(params, cfg, loss_cfg, test_args.num_queries)

    all_args = {'train': train_args, 'test': test_args, 'train_dset': train_dset_args}

    actual_data_paths = data_utils.get_data_paths_from_args(test_args.data_path)
    inference_retvals = []
    step_offset = 0
    outer_start = time.time()
    logger.info('Starting outer test loop over individual data paths...')
    for outer_step, cur_data_path in enumerate(actual_data_paths):
        logger.info(f'[{outer_step + 1}/{len(actual_data_paths)}] {cur_data_path}')
        loader, test_dset_args = factory.create_test_data_loader(
            train_args, test_args, train_dset_args, logger, data_path=cur_data_path)
        if outer_step == 0:
            logger.info('Final (first) test dataset args: ' + str(test_dset_args))
        stream_window = int(getattr(test_args, 'stream_window', 0) or 0)
        if 'plugin' in test_dset_args and stream_window > 0:
            cur = _test_inner_plugin_stream(all_args, engine, loader.dataset, logger,
                                            step_offset, stream_window)
        elif 'plugin' in test_dset_args:
            cur = _test_inner_plugin(all_args, engine, loader.dataset, logger, step_offset)
        else:
            cur = _test_inner_kubric(all_args, engine, loader, logger, step_offset)
        inference_retvals += cur
        step_offset += len(cur)
        del loader

    result = _test_postprocess(inference_retvals, logger)
    logger.epoch_finished(0)
    logger.info(f'Total time: {(time.time() - outer_start) / 3600.0:.3f} hours')
    return result


class _DictNS:
    '''Attribute view over a dict with reference-train-arg defaults.'''
    _DEFAULTS = dict(track_lw=1.0, occl_mask_lw=0.5, cont_mask_lw=0.5, occluded_weight=5.0,
                     occl_cont_zero_weight=0.02, class_balancing=True, focal_loss=False,
                     aot_loss=0.8, hard_negative_factor=3.0, front_occl_thres=0.95,
                     outer_cont_thres=0.75)

    def __init__(self, d: Dict[str, Any]):
        self._d = dict(self._DEFAULTS)
        self._d.update(d or {})

    def __getattr__(self, k):
        try:
            return self._d[k]
        except KeyError:
            raise AttributeError(k)
