"""Run the reference's own training CLI against a scene, via the refshim.

Executes /root/reference/scripts/train.py UNMODIFIED with
benchmarks/refshim (pure-torch torch_ngp/tinycudann stand-ins) and the
reference repo on sys.path, measuring wall-clock of the actual reference
code. Usage:

    python benchmarks/run_reference.py <scene> --iters 1000 [ref args...]

Prints a JSON line {wall_s, iters, rays_per_sec, args} and forwards the
reference CLI's own output (loss bar, eval PSNR).
"""
import json
import os
import runpy
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get('AUTOLABEL_REFERENCE', '/root/reference')


def main():
    argv = sys.argv[1:]
    assert argv, __doc__
    sys.path.insert(0, os.path.join(REPO, 'benchmarks', 'refshim'))
    sys.path.insert(0, REFERENCE)

    # The reference trains epochs of 1000 iterations; --iters maps to the
    # same flag its CLI exposes.
    train_py = os.path.join(REFERENCE, 'scripts', 'train.py')
    sys.argv = [train_py] + argv

    batch_size = 4096
    iters = 10000
    for i, a in enumerate(argv):
        if a in ('--batch-size', '-b'):
            batch_size = int(argv[i + 1])
        if a == '--iters':
            iters = int(argv[i + 1])

    start = time.perf_counter()
    runpy.run_path(train_py, run_name='__main__')
    wall = time.perf_counter() - start

    print(json.dumps({
        'wall_s': round(wall, 1),
        'iters': iters,
        'rays_per_sec': round(batch_size * iters / wall, 1),
        'args': argv,
        'stack': 'reference+refshim (pure-torch CPU)',
    }))


if __name__ == '__main__':
    main()
