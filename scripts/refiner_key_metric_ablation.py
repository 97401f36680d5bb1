"""Refiner best-checkpoint key-metric ablation (VERDICT r3 weak item 5).

The trainer selects the refiner's best checkpoint by continuous
``-pose_obj_err`` instead of the reference's thresholded ``pose_add``
(reference network/metrics.py:261-262) because the 0/1 indicator swings
wildly between adjacent checkpoints on small val sweeps. This script reads
a training run's val lines and reports what each selection rule would have
picked and how the picks score on BOTH metrics — the committed evidence
that the continuous rule does not sacrifice ADD-0.1d.

Usage: python scripts/refiner_key_metric_ablation.py \
         data/model/refiner_r4/train.txt [--out docs/refiner_key_metric.md]
"""
import argparse
import ast
import re


def parse_val_lines(path):
    rows = []
    pat = re.compile(r'val step (\d+) key=\S+ (\{.*\})')
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                rows.append((int(m.group(1)), ast.literal_eval(m.group(2))))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('train_txt', nargs='+')
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    lines = []
    for path in args.train_txt:
        rows = parse_val_lines(path)
        if not rows:
            print(f'{path}: no val lines')
            continue
        by_obj = min(rows, key=lambda r: r[1]['pose_obj_err'])
        by_add = max(rows, key=lambda r: r[1]['pose_add-0.1'])
        lines.append(f'### {path} ({len(rows)} val sweeps)\n')
        lines.append('| selection rule | step | pose_obj_err | ADD-0.1d | Prj-5 |')
        lines.append('|---|---|---|---|---|')
        for name, (step, m) in (('min pose_obj_err (ours)', by_obj),
                                ('max pose_add (reference)', by_add)):
            lines.append(f"| {name} | {step} | {m['pose_obj_err']:.4f} | "
                         f"{m['pose_add-0.1']:.4f} | {m['pose_prj-5']:.4f} |")
        # how much ADD the continuous rule gives up vs the indicator's best
        gap = by_add[1]['pose_add-0.1'] - by_obj[1]['pose_add-0.1']
        lines.append(f'\nADD-0.1d given up by the continuous rule: '
                     f'**{gap:+.4f}**\n')
    text = '\n'.join(lines)
    print(text)
    if args.out:
        with open(args.out, 'w') as f:
            f.write('# Refiner best-checkpoint key-metric ablation\n\n'
                    'Selection by continuous object-space error vs the '
                    'reference\'s thresholded ADD-0.1d indicator '
                    '(trainer.py key metric; VERDICT r3 weak 5).\n\n' + text + '\n')


if __name__ == '__main__':
    main()
