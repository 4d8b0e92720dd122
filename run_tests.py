#!/usr/bin/env python
"""Sharded test runner: the documented full-suite gate.

`python -m pytest tests/` in one process accumulates ~300 tests of XLA
compile state and has twice segfaulted inside XLA-CPU
backend_compile_and_load after ~200 green tests (every subset passes,
so no individual test is at fault).  tests/conftest.py now clears the
jit caches per module, which fixes the monolithic run in this image --
this runner is the belt-and-braces gate: it shards the test files
across worker processes so no process ever compiles more than a
fraction of the suite, and it is also ~Nx faster.

Usage:  python run_tests.py [-j N] [extra pytest args]
Exit code 0 iff every shard passed.
"""
import argparse
import os
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('-j', type=int, default=min(8, os.cpu_count() or 4),
                    help='worker processes (default: min(8, ncpu))')
    args, extra = ap.parse_known_args()

    here = os.path.dirname(os.path.abspath(__file__))
    test_dir = os.path.join(here, 'tests')
    files = sorted(f for f in os.listdir(test_dir)
                   if f.startswith('test_') and f.endswith('.py'))
    # round-robin by size-rank so each shard gets a mix of heavy/light
    # files (the heavy diff/e2e files would otherwise pile into one)
    ranked = sorted(files, key=lambda f: -os.path.getsize(
        os.path.join(test_dir, f)))
    shards = [[] for _ in range(args.j)]
    for i, f in enumerate(ranked):
        shards[i % args.j].append(os.path.join('tests', f))
    shards = [s for s in shards if s]

    t0 = time.perf_counter()
    procs = []
    for i, shard in enumerate(shards):
        cmd = [sys.executable, '-m', 'pytest', '-q',
               '-p', 'no:cacheprovider'] + extra + shard
        logf = open(f'/tmp/run_tests_shard{i}.log', 'w')
        procs.append((i, shard, logf,
                      subprocess.Popen(cmd, cwd=here, stdout=logf,
                                       stderr=subprocess.STDOUT)))

    failed = []
    passed = fail_ct = 0
    for i, shard, logf, p in procs:
        rc = p.wait()
        logf.close()
        tail = open(logf.name).read().strip().splitlines()
        summary = tail[-1] if tail else '(no output)'
        for tok in summary.replace(',', ' ').split():
            pass
        print(f'shard {i} ({len(shard)} files): rc={rc}  {summary}')
        if rc != 0:
            failed.append((i, logf.name))
            print(open(logf.name).read()[-3000:])
    dt = time.perf_counter() - t0
    if failed:
        print(f'FAILED shards: {[i for i, _ in failed]}  ({dt:.0f}s)')
        return 1
    print(f'all {len(shards)} shards green in {dt:.0f}s')
    return 0


if __name__ == '__main__':
    sys.exit(main())
