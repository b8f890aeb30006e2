'''
Metrics + supervision-builder tests against numpy loop oracles transcribing the reference
control flow (/root/reference/eval/metrics.py:9-113, /root/reference/data/data_utils.py:414-510).
'''

import numpy as np
import pytest
import jax.numpy as jnp

import conftest  # noqa: F401
from tcow_tpu.objectives import metrics as M
from tcow_tpu.objectives import supervision as S


def _oracle_metrics(output_mask, target_mask):
    out_b = output_mask > 0.0
    tgt_b = target_mask > 0.5
    B, Q, C, T = out_b.shape[:4]
    Ct = target_mask.shape[2]
    fam = {k: [] for k in M.METRIC_KEYS}
    for b in range(B):
        for q in range(Q):
            for t in range(T):
                def iou(c):
                    inter = np.logical_and(out_b[b, q, c, t], tgt_b[b, q, c, t]).sum()
                    union = np.logical_or(out_b[b, q, c, t], tgt_b[b, q, c, t]).sum()
                    return inter / (union + 1e-7)
                a0 = tgt_b[b, q, 0, t].sum()
                if a0 > 0:
                    fam['snitch_iou'].append(iou(0))
                if Ct >= 2 and tgt_b[b, q, 1, t].sum() > 0:
                    fam['occl_mask_iou'].append(iou(1))
                if Ct >= 3 and tgt_b[b, q, 2, t].sum() > 0:
                    fam['cont_mask_iou'].append(iou(2))
                if a0 > 0 and Ct >= 2 and tgt_b[b, q, 1, t].sum() == 0:
                    fam['snitch_during_vis_iou'].append(iou(0))
                if a0 > 0 and Ct >= 2 and tgt_b[b, q, 1, t].sum() > 0:
                    fam['snitch_during_occl_iou'].append(iou(0))
                if a0 > 0 and Ct >= 3 and tgt_b[b, q, 2, t].sum() > 0:
                    fam['snitch_during_cont_iou'].append(iou(0))
    out = {}
    for k, v in fam.items():
        out[f'mean_{k}'] = float(np.mean(v)) if v else -1.0
        out[f'count_{k}'] = len(v)
    return out


def test_metrics_match_oracle():
    rng = np.random.RandomState(0)
    B, Q, C, T, H, W = 2, 2, 3, 5, 12, 16
    out = rng.randn(B, Q, C, T, H, W).astype(np.float32)
    tgt = (rng.rand(B, Q, C, T, H, W) > 0.7).astype(np.float32)
    tgt[:, :, 1, :2] = 0.0  # some frames with no occluder
    got = M.calculate_metrics_mask_track(jnp.asarray(out), jnp.asarray(tgt))
    want = _oracle_metrics(out, tgt)
    for k in want:
        if k.startswith('count'):
            assert got[k] == want[k], k
        else:
            assert abs(got[k] - want[k]) < 1e-5, (k, got[k], want[k])


def test_metrics_negative_targets_ignored():
    out = np.ones((1, 1, 3, 2, 4, 4), np.float32)
    tgt = -np.ones((1, 1, 3, 2, 4, 4), np.float32)  # all unannotated
    got = M.calculate_metrics_mask_track(jnp.asarray(out), jnp.asarray(tgt))
    for k in M.METRIC_KEYS:
        assert got[f'count_{k}'] == 0
        assert got[f'mean_{k}'] == -1.0


def test_weighted_unweighted_aggregation():
    m1 = {f'mean_{k}': 0.5 for k in M.METRIC_KEYS}
    m1.update({f'count_{k}': 10 for k in M.METRIC_KEYS})
    m2 = {f'mean_{k}': 1.0 for k in M.METRIC_KEYS}
    m2.update({f'count_{k}': 30 for k in M.METRIC_KEYS})
    m3 = {f'mean_{k}': -1.0 for k in M.METRIC_KEYS}
    m3.update({f'count_{k}': 0 for k in M.METRIC_KEYS})
    w = M.calculate_weighted_averages([m1, m2, m3])
    u = M.calculate_unweighted_averages([m1, m2, m3])
    assert abs(w['mean_snitch_iou'] - (0.5 * 10 + 1.0 * 30) / 40) < 1e-5
    assert w['count_snitch_iou'] == 40
    assert abs(u['mean_snitch_iou'] - 0.75) < 1e-6
    assert u['count_snitch_iou'] == 2


# ---------------------------------------------------------------------------
# Supervision builder
# ---------------------------------------------------------------------------

def _oracle_fill(segm, div_segm, query_idx, qt_idx, occl_fracs, occl_cont_dag,
                 fot=0.95, oct_=0.75):
    '''Numpy transcription of data_utils.py:414-510 for a single example/query.'''
    T, H, W = segm.shape
    M_ = div_segm.shape[0]
    query_mask = np.zeros((T, H, W), np.float32)
    query_mask[qt_idx] = (segm[qt_idx] == query_idx + 1)
    ptr = np.zeros((T, H, W), np.int32)
    occl = np.logical_and(div_segm[query_idx] == 1, segm != query_idx + 1)
    ptr[occl] = segm[occl]
    target = np.zeros((3, T, H, W), np.float32)
    target[0] = (div_segm[query_idx] == 1)
    flags = np.zeros((T, 3), np.float32)
    ocid = np.zeros((T, 2), np.int32)
    for t in range(T):
        if occl_fracs[query_idx, t, 0] >= fot and \
                occl_cont_dag[t, query_idx, :, 2].max() >= fot / 2.0:
            fid = int(occl_cont_dag[t, query_idx, :, 2].argmax())
            ocid[t, 0] = fid + 1
            flags[t, 0] = 1
            target[1, t] = (div_segm[fid, t] == 1)
        if occl_cont_dag[t, query_idx, :, 0].max() >= oct_:
            cids = np.nonzero(occl_cont_dag[t, query_idx, :, 0] >= oct_)[0].tolist()
            oid = int(occl_cont_dag[t, query_idx, :, 0].argmax())
            if len(cids) > 1:
                oid = min(cids, key=lambda l: occl_cont_dag[t, l, :, 0].max())
            ocid[t, 1] = oid + 1
            flags[t, 1] = 1
            target[2, t] = (div_segm[oid, t] == 1)
    flags[:, 2] = occl_fracs[query_idx, :, 0]
    return query_mask, ptr, ocid, target, flags


def _random_scene(rng, T=5, H=16, W=20, M_=6, K=4):
    segm = rng.randint(0, K + 1, size=(T, H, W)).astype(np.int32)
    div = np.zeros((M_, T, H, W), np.uint8)
    for k in range(K):
        div[k] = (rng.rand(T, H, W) > 0.6).astype(np.uint8)
        # visible pixels must be inside the amodal mask for realism (not required by the code)
        div[k] |= (segm == k + 1).astype(np.uint8)
    occl_fracs = rng.rand(M_, T, 3).astype(np.float32)
    occl_fracs[K:] = 0
    dag = rng.rand(T, M_, M_, 3).astype(np.float32)
    dag[:, np.arange(M_), np.arange(M_)] = 0.0
    dag[:, K:, :] = 0.0
    dag[:, :, K:] = 0.0
    return segm, div, occl_fracs, dag


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_supervision_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    segm, div, occl_fracs, dag = _random_scene(rng)
    # Push some entries over the thresholds so both branches trigger.
    occl_fracs[:, ::2, 0] = 0.99
    dag[::2, :, 1, 0] = 0.9
    dag[1::2, :, 2, 2] = 0.8
    query_idx, qt_idx = 0, 1
    got = S.fill_query_target_single(
        jnp.asarray(segm), jnp.asarray(div), jnp.int32(query_idx), jnp.int32(qt_idx),
        jnp.asarray(occl_fracs), jnp.asarray(dag))
    qm, ptr, ocid, target, flags = _oracle_fill(segm, div, query_idx, qt_idx,
                                                occl_fracs, dag)
    np.testing.assert_array_equal(np.asarray(got['seeker_query_mask'][0]), qm)
    np.testing.assert_array_equal(np.asarray(got['snitch_occl_by_ptr'][0]), ptr)
    np.testing.assert_array_equal(np.asarray(got['full_occl_cont_id']), ocid)
    np.testing.assert_array_equal(np.asarray(got['target_mask']), target)
    np.testing.assert_allclose(np.asarray(got['target_flags']), flags, rtol=1e-6)


def test_supervision_batched_shapes():
    rng = np.random.RandomState(3)
    segm, div, occl_fracs, dag = _random_scene(rng)
    B, Q = 2, 3
    batch = lambda x: jnp.asarray(np.stack([x] * B))
    res = S.fill_query_target_batch(batch(segm), batch(div),
                                    jnp.asarray(np.tile(np.arange(Q, dtype=np.int32), (B, 1))),
                                    jnp.int32(0), batch(occl_fracs), batch(dag))
    T, H, W = segm.shape
    assert res['seeker_query_mask'].shape == (B, Q, 1, T, H, W)
    assert res['target_mask'].shape == (B, Q, 3, T, H, W)
    assert res['target_flags'].shape == (B, Q, T, 3)
    assert res['full_occl_cont_id'].shape == (B, Q, T, 2)
