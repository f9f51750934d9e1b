"""Multi-seed A/B of the exact-gather annealing tail (VERDICT r4 #2).

Runs the flagship room-10k quality config (simplex, sampled-backward 2,
backward_points 0.25) for --seeds seeds, each with exact_final_fraction
0.1 (tail on) and 0.0 (tail off), in ONE process: the axon tunnel's
first-fetch handshake and every jit compile are paid once, not per run.
One JSON line per run (grid_quality_ab's schema) + a summary line.

Usage: python benchmarks/exact_tail_seeds.py .scenes/room [--iters 10000]
"""
import argparse
import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import grid_quality_ab


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('scene')
    parser.add_argument('--iters', type=int, default=10000)
    parser.add_argument('--seeds', type=int, default=3)
    flags = parser.parse_args()

    results = {0.1: [], 0.0: []}
    for seed in range(flags.seeds):
        for tail in (0.1, 0.0):
            argv = ['grid_quality_ab.py', flags.scene,
                    '--iters', str(flags.iters),
                    '--interp', 'simplex',
                    '--sampled-backward', '2',
                    '--backward-points', '0.25',
                    '--exact-final-fraction', str(tail),
                    '--seed', str(seed)]
            old_argv = sys.argv
            sys.argv = argv
            buf = io.StringIO()
            try:
                with redirect_stdout(buf):
                    grid_quality_ab.main()
            finally:
                sys.argv = old_argv
            line = buf.getvalue().strip().splitlines()[-1]
            print(line, flush=True)
            results[tail].append(json.loads(line))

    def stats(rs):
        psnrs = [r['psnr_db'] for r in rs]
        mean = sum(psnrs) / len(psnrs)
        spread = max(psnrs) - min(psnrs)
        return {'psnr_mean': round(mean, 3), 'psnr_min': min(psnrs),
                'psnr_max': max(psnrs), 'psnr_spread': round(spread, 3),
                'depth_mae_mean': round(
                    sum(r['depth_mae'] for r in rs) / len(rs), 4)}

    on, off = stats(results[0.1]), stats(results[0.0])
    print(json.dumps({
        'summary': 'exact_tail_seed_ab',
        'iters': flags.iters,
        'seeds': flags.seeds,
        'tail_on': on,
        'tail_off': off,
        'delta_mean_db': round(on['psnr_mean'] - off['psnr_mean'], 3),
        'max_seed_spread_db': max(on['psnr_spread'], off['psnr_spread']),
    }), flush=True)


if __name__ == '__main__':
    main()
