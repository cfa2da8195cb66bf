"""Summarize device op times from a jax.profiler trace (vm.trace.json.gz).

Usage: python tools/trace_summary.py /tmp/nvdr_trace [top_n]
Aggregates TensorFlow-op / XLA-op durations by name prefix on device tracks.
"""
import collections
import glob
import gzip
import json
import re
import sys


def main(trace_dir, top_n=40):
    files = sorted(glob.glob(trace_dir + '/**/*.trace.json.gz', recursive=True))
    assert files, 'no trace found under %s' % trace_dir
    with gzip.open(files[-1], 'rt') as f:
        data = json.load(f)
    events = data['traceEvents']
    # device tracks: pid names containing TPU / device
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pid_names[e['pid']] = e['args'].get('name', '')
        if e.get('ph') == 'M' and e.get('name') == 'thread_name':
            tid_names[(e['pid'], e['tid'])] = e['args'].get('name', '')
    dev_pids = {p for p, n in pid_names.items()
                if re.search(r'TPU|Device|/device', n, re.I)}
    agg = collections.Counter()
    total = 0.0
    n_steps = collections.Counter()
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in dev_pids:
            continue
        tname = tid_names.get((e['pid'], e['tid']), '')
        if 'step' in tname.lower():
            continue
        name = e.get('name', '')
        dur = e.get('dur', 0) / 1e3  # ms
        # strip trailing .N and fusion numbering for grouping
        key = re.sub(r'[.\d]+$', '', name)
        agg[key] += dur
        n_steps[key] += 1
        total += dur
    print('total device op time: %.1f ms (across traced steps)' % total)
    print('%-60s %10s %6s' % ('op group', 'ms', 'count'))
    for k, v in agg.most_common(int(top_n)):
        print('%-60s %10.2f %6d' % (k[:60], v, n_steps[k]))


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/nvdr_trace',
         sys.argv[2] if len(sys.argv) > 2 else 40)
