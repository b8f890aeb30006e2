'''
Bulk-precomputes the Kubric preprocessing caches (decode + hue->ID + occlusion stats + DAG)
for a dataset root, so training is never blocked on first-epoch preprocessing.

The reference hides this cost behind 24 DataLoader workers at train time
(data_kubric.py:204-212, SURVEY.md section 7.3); on TPU hosts it is better done once,
explicitly, with all cores:

  python tools/warm_cache.py --data_path /data/kubcon_v10 --num_frames 30 --max_delay 6 \
      --workers 16

The preprocessing cache is keyed by the TEMPORAL VARIANT (first/second/last loaded frame
index: offset x stride x span, kubric.py:_load_example_deterministic), and training's
random temporal augmentations sample a fresh variant per item per epoch — so warming one
item per scene still leaves most epochs paying 10-15 s/item cache builds on a small host.
`--variant_epochs N` enumerates the exact variants training will request over N epochs
(same per-(epoch, index) RNG as the dataset), dedupes them by cache key, and builds only
the missing ones.
'''

import argparse
import concurrent.futures
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data_path', required=True)
    p.add_argument('--num_frames', type=int, default=24)
    p.add_argument('--max_delay', type=int, default=6)
    p.add_argument('--frame_stride', type=int, default=1)
    p.add_argument('--workers', type=int, default=max(os.cpu_count() - 1, 1))
    p.add_argument('--phases', nargs='+', default=['train', 'val', 'test'])
    p.add_argument('--variant_epochs', type=int, default=0,
                   help='>0: enumerate the temporal-aug cache variants the dataset will '
                        'request over this many epochs (same RNG) and build the missing '
                        'ones, instead of one variant per scene')
    p.add_argument('--seed', type=int, default=0, help='must match the training seed '
                   'for exact variant enumeration (any full sweep still helps)')
    # Aug params that shape the variant RNG stream — match the training flags (defaults
    # mirror config.py). Only temporal/structural sampling matters; later draws (queries,
    # pixel augs) do not affect frame_inds_load.
    p.add_argument('--reverse_prob', type=float, default=0.1)
    p.add_argument('--palindrome_prob', type=float, default=0.1)
    p.add_argument('--augs_2d', type=int, default=1)
    p.add_argument('--time_stretch_max', type=float, default=1.0)
    a = p.parse_args()

    import numpy as np
    from tcow_tpu.data.kubric import KubricQueryDataset

    for phase in a.phases:
        try:
            ds = KubricQueryDataset(
                a.data_path, None, phase, num_frames=a.num_frames,
                frame_stride=a.frame_stride, max_delay=a.max_delay, num_queries=1,
                augs_2d=bool(a.augs_2d) if a.variant_epochs else False,
                reverse_prob=a.reverse_prob, palindrome_prob=a.palindrome_prob,
                time_stretch_max=a.time_stretch_max,
                frame_height=64, frame_width=64, seed=a.seed)
        except (ValueError, FileNotFoundError):
            continue
        if len(ds) == 0:
            continue
        t0 = time.time()
        done = 0

        if a.variant_epochs > 0:
            # Enumerate (scene, temporal-variant) jobs exactly as __getitem__ would.
            jobs = {}
            for epoch in range(a.variant_epochs):
                ds.set_epoch(epoch)
                for i in range(len(ds)):
                    rng = ds._item_rng(i, 0)
                    scene_idx = (int(rng.integers(ds.dset_size)) if ds.force_shuffle
                                 else i % ds.dset_size)
                    ap = ds.augs_pipeline.sample_augs_params(rng)
                    f = ap['frame_inds_load']
                    jobs.setdefault((scene_idx, f[0], f[1], f[-1]), (scene_idx, ap))
            qt = int(np.floor(ds.query_time * ds.num_frames_load))
            print(f'[{phase}] {len(jobs)} unique (scene, variant) caches over '
                  f'{a.variant_epochs} epochs; building with {a.workers} workers...')

            def warm(job):
                scene_idx, ap = job
                ds._load_example_deterministic(ds.scene_dps[scene_idx], ap, qt,
                                               force_renew_cache=False)

            with concurrent.futures.ThreadPoolExecutor(a.workers) as pool:
                for _ in pool.map(warm, list(jobs.values())):
                    done += 1
                    if done % 50 == 0:
                        rate = done / (time.time() - t0)
                        print(f'  {done}/{len(jobs)} ({rate:.2f} variants/s)', flush=True)
        else:
            print(f'[{phase}] warming {ds.dset_size} scene caches with '
                  f'{a.workers} workers...')

            def warm(i):
                # Only the cached preprocessing matters; augmentations are cheap + random.
                ds[i]
                return i

            with concurrent.futures.ThreadPoolExecutor(a.workers) as pool:
                for _ in pool.map(warm, range(ds.dset_size)):
                    done += 1
                    if done % 50 == 0:
                        rate = done / (time.time() - t0)
                        print(f'  {done}/{ds.dset_size} ({rate:.2f} scenes/s)',
                              flush=True)
        print(f'[{phase}] done in {time.time() - t0:.1f}s')


if __name__ == '__main__':
    main()
