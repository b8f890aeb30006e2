'''
On-device construction of per-query supervision targets.

Reimplements /root/reference/data/data_utils.py:414-510
(`fill_kubric_query_target_mask_flags`) as a pure, vectorized jnp function so it runs inside
the jitted train step (the reference runs the equivalent python loop on GPU per query).

Given visible instance segmentation, amodal per-instance ("divided") masks, occlusion
fractions and the occlusion/containment DAG, produce for one (example, query):
  - the query mask: visible snitch pixels at the query frame (data_utils.py:431),
  - snitch_occl_by_ptr: occluder instance-ID + 1 at amodal-snitch pixels that are not visible
    (data_utils.py:435-437),
  - target mask channel 0: amodal snitch (data_utils.py:441),
  - channel 1: frontmost occluder when snitch occlusion fraction >= front_occl_thres and the
    strongest frontmost-occlusion pointer >= front_occl_thres / 2 (data_utils.py:454-461),
  - channel 2: outermost container via min-max over the containment DAG at >= outer_cont_thres
    with recursive-containment resolution (data_utils.py:466-487),
  - full_occl_cont_id (T, 2) instance-ID + 1 bookkeeping and target_flags (T, 3) =
    (occluded, contained, occl_fraction) (data_utils.py:458-490).

All instance axes are padded to a static M (36 in the reference datasets); padded rows are
zero and can never pass the thresholds.
'''

import functools
from typing import Dict

import jax
import jax.numpy as jnp


def fill_query_target_single(segm, div_segm, query_idx, qt_idx, occl_fracs, occl_cont_dag,
                             front_occl_thres: float = 0.95, outer_cont_thres: float = 0.75
                             ) -> Dict[str, jnp.ndarray]:
    '''Single example, single query.

    :param segm (T, H, W) int32: 1-based visible instance IDs (0 = background).
    :param div_segm (M, T, H, W): binary amodal masks per (padded) instance.
    :param query_idx scalar int32 in [0, M): snitch instance index.
    :param qt_idx scalar int32: query frame.
    :param occl_fracs (M, T, 3) float32 with (f, v, t).
    :param occl_cont_dag (T, M, M, 3) float32 with (c, od, of), indexed (ref, cand).
    :return dict of arrays (see module docstring).
    '''
    T, H, W = segm.shape
    M = div_segm.shape[0]
    div_segm = div_segm.astype(jnp.int32)

    snitch_div = jnp.take(div_segm, query_idx, axis=0)            # (T, H, W) amodal snitch
    visible_snitch = (segm == query_idx + 1)

    is_qt = (jnp.arange(T) == qt_idx)[:, None, None]
    query_mask = jnp.where(is_qt, visible_snitch, False)          # (T, H, W)

    occl_pixels = jnp.logical_and(snitch_div == 1, ~visible_snitch)
    snitch_occl_by_ptr = jnp.where(occl_pixels, segm, 0)          # (T, H, W) ID + 1

    target0 = (snitch_div == 1)

    # Frontmost occluder per frame (data_utils.py:454-461).
    of_rows = jnp.take(occl_cont_dag[..., 2], query_idx, axis=1)  # (T, M)
    snitch_occl_frac = jnp.take(occl_fracs[..., 0], query_idx, axis=0)  # (T,)
    front_cond = jnp.logical_and(snitch_occl_frac >= front_occl_thres,
                                 jnp.max(of_rows, axis=1) >= front_occl_thres / 2.0)  # (T,)
    front_id = jnp.argmax(of_rows, axis=1)                        # (T,)

    div_t_first = jnp.swapaxes(div_segm, 0, 1)                    # (T, M, H, W)
    front_mask = jnp.take_along_axis(div_t_first, front_id[:, None, None, None], axis=1)[:, 0]
    target1 = jnp.logical_and(front_cond[:, None, None], front_mask == 1)

    # Outermost container per frame (data_utils.py:466-487): among instances whose containment
    # of the snitch is >= thres, pick the one least contained by anything else (min over the
    # candidates of max_j c[cand, j]); python min ties resolve to the lowest instance index,
    # as does argmin here.
    c_rows = jnp.take(occl_cont_dag[..., 0], query_idx, axis=1)   # (T, M) c[query, cand]
    cont_cond = jnp.max(c_rows, axis=1) >= outer_cont_thres       # (T,)
    is_container = c_rows >= outer_cont_thres                     # (T, M)
    cand_score = jnp.max(occl_cont_dag[..., 0], axis=2)           # (T, M): max_j c[k, j]
    big = jnp.float32(3.4e38)
    outer_id = jnp.argmin(jnp.where(is_container, cand_score, big), axis=1)  # (T,)
    outer_mask = jnp.take_along_axis(div_t_first, outer_id[:, None, None, None], axis=1)[:, 0]
    target2 = jnp.logical_and(cont_cond[:, None, None], outer_mask == 1)

    full_occl_cont_id = jnp.stack([
        jnp.where(front_cond, front_id + 1, 0),
        jnp.where(cont_cond, outer_id + 1, 0)], axis=-1).astype(jnp.int32)  # (T, 2)

    target_flags = jnp.stack([
        front_cond.astype(jnp.float32),
        cont_cond.astype(jnp.float32),
        snitch_occl_frac.astype(jnp.float32)], axis=-1)           # (T, 3)

    target_mask = jnp.stack([target0, target1, target2], axis=0).astype(jnp.float32)

    return {
        'seeker_query_mask': query_mask.astype(jnp.float32)[None],     # (1, T, H, W)
        'snitch_occl_by_ptr': snitch_occl_by_ptr.astype(jnp.int32)[None],  # (1, T, H, W)
        'full_occl_cont_id': full_occl_cont_id,                        # (T, 2)
        'target_mask': target_mask,                                    # (3, T, H, W)
        'target_flags': target_flags,                                  # (T, 3)
    }


@functools.partial(jax.jit, static_argnames=('front_occl_thres', 'outer_cont_thres'))
def fill_query_target_batch(segm, div_segm, query_inds, qt_idx, occl_fracs, occl_cont_dag,
                            front_occl_thres: float = 0.95, outer_cont_thres: float = 0.75
                            ) -> Dict[str, jnp.ndarray]:
    '''Batched over (B examples, Q queries).

    :param segm (B, T, H, W) int32.
    :param div_segm (B, M, T, H, W).
    :param query_inds (B, Q) int32.
    :param qt_idx scalar int32 (shared across the batch, pipeline.py:141).
    :param occl_fracs (B, M, T, 3).
    :param occl_cont_dag (B, T, M, M, 3).
    :return dict with a (B, Q, ...) leading shape on every entry.
    '''
    per_query = jax.vmap(fill_query_target_single,
                         in_axes=(None, None, 0, None, None, None, None, None))
    per_example = jax.vmap(per_query, in_axes=(0, 0, 0, None, 0, 0, None, None))
    return per_example(segm, div_segm, query_inds, qt_idx, occl_fracs, occl_cont_dag,
                       front_occl_thres, outer_cont_thres)
