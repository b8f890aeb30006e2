'''Profile the warm host item pipeline stage by stage (VERDICT r2 task 7).

Times N warm items from a kubric-format scene root on the flagship loader config
(T=30 @ 240x320, M=36, device color jitter) and prints a per-stage breakdown by
monkeypatching timers around the pipeline internals. Pure host work - safe to run
while the TPU is busy (but results are only meaningful on an idle core).

Usage: python tools/profile_item.py --data_path /tmp/kubrich64 [--items 8]
'''

import argparse
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data_path', required=True)
    ap.add_argument('--items', type=int, default=8)
    ap.add_argument('--num_frames', type=int, default=30)
    ap.add_argument('--profile', type=int, default=1, help='also run cProfile')
    args = ap.parse_args()

    from tcow_tpu.data.kubric import KubricQueryDataset, collate_kubric

    ds = KubricQueryDataset(args.data_path, None, 'train', num_frames=args.num_frames,
                            frame_height=240, frame_width=320, num_queries=3,
                            device_color_jitter=True)
    # Warm pass (builds/loads npz caches; not timed).
    for i in range(min(args.items, len(ds))):
        ds[i]
    t0 = time.perf_counter()
    items = [ds[i] for i in range(min(args.items, len(ds)))]
    t1 = time.perf_counter()
    n = len(items)
    print(f'warm item: {(t1 - t0) / n * 1000:.0f} ms/item over {n} items')
    t2 = time.perf_counter()
    for i in range(0, n - 1, 2):
        collate_kubric(items[i:i + 2], 3, 'train')
    t3 = time.perf_counter()
    print(f'collate(B=2): {(t3 - t2) / max(1, (n - 1) // 2) * 1000:.0f} ms/batch')

    if args.profile:
        pr = cProfile.Profile()
        pr.enable()
        for i in range(n):
            ds[i]
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats('cumulative').print_stats(30)
        print(s.getvalue())


if __name__ == '__main__':
    sys.exit(main())
