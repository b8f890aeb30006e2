'''
Assembles a mixed kubric-format dataset directory by SYMLINKING scene dirs from existing
datasets (data mixes for containment-generalization studies, VERDICT r4 task 1).

Scene dirs keep their original names (the reader resolves <scene_dn>/<scene_dn>.json,
tcow_tpu/data/kubric.py:212), so preprocessing caches inside the source scene dirs
(cc_tpu_* subdirs) stay shared: a mix of an already-warm dataset and a fresh one only
pays cache builds for the fresh scenes.

Usage:
  python tools/mix_dataset.py --out /tmp/rich512mix --sources /tmp/rich256,/tmp/rich256c
'''

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', required=True)
    p.add_argument('--sources', required=True, help='comma-separated dataset roots')
    a = p.parse_args()
    os.makedirs(a.out, exist_ok=True)
    n = 0
    for src in a.sources.split(','):
        src = os.path.abspath(src)
        for dn in sorted(os.listdir(src)):
            sp = os.path.join(src, dn)
            if 'scn' not in dn or not os.path.isdir(sp):
                continue
            if not os.path.exists(os.path.join(sp, dn + '.json')) and \
                    not os.path.exists(os.path.join(sp, dn + '_p0_v0.json')):
                continue   # incomplete scene (no completion-marker metadata)
            dst = os.path.join(a.out, dn)
            if os.path.islink(dst) or os.path.exists(dst):
                raise FileExistsError(f'duplicate scene name {dn} in mix')
            os.symlink(sp, dst)
            n += 1
    print(f'linked {n} scenes into {a.out}')


if __name__ == '__main__':
    main()
