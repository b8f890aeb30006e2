'''
Collects the rich-campaign trajectory (VERDICT r3 task 2) into one markdown table.

Each chunk of tools/rich_campaign.sh scores the latest checkpoint on the fixed 16-scene
rich eval set with eval/test.py; this tool greps those logs' `weighted_mean_<family>`
lines (evaluation/test_driver.py:165 — global frame-weighted means, the reference's
primary aggregation, /root/reference/eval/metrics.py:86-103) plus the train log's
per-epoch trajectory, and prints the table that goes into BASELINE.md.

Usage: python tools/campaign_table.py [--logs /tmp/rich_logs] --name rich256
The default --logs is the IN-REPO archive docs/campaign_r4/ (scalars.jsonl + train.log +
per-chunk eval logs/CSVs, copied verbatim from the campaign's log root minus the video
artifacts), so the BASELINE.md table regenerates from committed evidence.
'''

import argparse
import glob
import os
import re

FAMILIES = ('snitch_iou', 'occl_mask_iou', 'cont_mask_iou',
            'snitch_during_vis_iou', 'snitch_during_occl_iou', 'snitch_during_cont_iou')


def parse_eval_log(path):
    out = {}
    text = open(path, errors='replace').read()
    for fam in FAMILIES:
        m = re.findall(rf'(?<!un)weighted_mean_{fam} \(over (\d+) frames\):\s*([0-9.nan]+)',
                       text)
        if m:
            out[fam] = (float(m[-1][1]), int(m[-1][0]))
    return out


def last_epoch(train_log):
    '''Highest completed train epoch in the driver log (for labeling eval rows).'''
    eps = re.findall(r'\[train\] epoch (\d+) wall', open(train_log, errors='replace').read())
    return int(eps[-1]) if eps else -1


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--logs',
                   default=os.path.join(os.path.dirname(__file__), '..', 'docs',
                                        'campaign_r4'))
    p.add_argument('--name', default='rich256')
    a = p.parse_args()

    # The eval CLI writes its unwrapped log under the RUN's log dir:
    # <logs>/<name>/test_e_<name>_c<chunk>_e<epoch>/<same>.log (utils/logvis.py); the
    # console capture (<name>.eval_c*.log) is width-wrapped by rich and unparseable.
    rows = []
    pat = os.path.join(a.logs, a.name, f'test_e_{a.name}_c*_e*', '*.log')

    def key(path):
        # Anchor on the eval directory name (not the full path): a run --name that itself
        # contains a _c<d>_e<d> token, or a stray non-matching .log, must not mislabel or
        # crash the sort.
        m = re.search(rf'test_e_{re.escape(a.name)}_c(\d+)_e(\d+)',
                      os.path.basename(os.path.dirname(path)))
        return (int(m.group(2)), int(m.group(1))) if m else None

    for path in sorted((p for p in glob.glob(pat) if key(p) is not None), key=key):
        epoch, chunk = key(path)
        fams = parse_eval_log(path)
        if fams:
            rows.append((f'chunk {chunk} (epoch {epoch})', fams))

    hdr = '| point | ' + ' | '.join(f.replace('_iou', '') for f in FAMILIES) + ' |'
    print(hdr)
    print('|' + '---|' * (len(FAMILIES) + 1))
    for label, fams in rows:
        cells = []
        for f in FAMILIES:
            if f in fams:
                v, n = fams[f]
                cells.append(f'{v:.3f} ({n}f)')
            else:
                cells.append('—')
        print(f'| {label} | ' + ' | '.join(cells) + ' |')

    tl = os.path.join(a.logs, a.name, 'train.log')
    if os.path.exists(tl):
        print(f'\ncompleted train epochs: {last_epoch(tl) + 1}')


if __name__ == '__main__':
    main()
