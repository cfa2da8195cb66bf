"""Tetrahedral grid generator for DMTet.

The reference bundles quartet-generated grids (data/tets/*.npz) and a script
invoking the external `quartet` tool.  This generator is self-contained: it
emits a Kuhn-triangulated cube grid (6 positively-oriented tets per cell, see
nvdiffrecmc_tpu/geometry/dmtet.py:kuhn_tet_grid) in the same .npz format
(vertices in [-0.5, 0.5]^3 + int indices), so any resolution can be produced
without external dependencies:

    python data/tets/generate_tets.py --res 64 128
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, nargs='+', default=[32, 64, 128])
    ap.add_argument('--out', default=os.path.dirname(os.path.abspath(__file__)))
    args = ap.parse_args()

    from nvdiffrecmc_tpu.geometry.dmtet import kuhn_tet_grid
    for res in args.res:
        verts, idx = kuhn_tet_grid(res)
        path = os.path.join(args.out, '%d_tets.npz' % res)
        np.savez_compressed(path, vertices=verts, indices=idx)
        print('wrote %s: %d vertices, %d tets' % (path, len(verts), len(idx)))


if __name__ == '__main__':
    main()
