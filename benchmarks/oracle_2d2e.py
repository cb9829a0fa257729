"""Grid-converged 2D two-electron ED oracle numbers (VERDICT r2 item 3).

Computes the exact ground energies of the catalogue's 2D two-electron
entries (He and H2, physics/systems.py — the entries the reference lists
but could never run, /root/reference/waveflow/utils/physics.py:24-25 with
its 1D-only potential) by sparse ED in the antisymmetric site-pair basis
at three grid resolutions, plus Richardson extrapolation in h²
(empirically exact to ~1e-4 on the analytic free-fermion box, see
tests/test_physics.py::test_exact_2d_2e_free_fermions_matches_analytic).

Writes results/oracle_2d_2e.json.  CPU-only (SciPy); ~10-20 min.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from waveflow_tpu.physics import exact_ground_state_2d_2e, system_catalogue

BOX_LENGTH = 5.0
GRIDS = (24, 32, 40)


def richardson(e_coarse, e_fine, n_coarse, n_fine):
    """O(h²) Richardson extrapolation, h ∝ 1/(n+1)."""
    r = ((n_coarse + 1) / (n_fine + 1)) ** -2
    return e_fine + (e_fine - e_coarse) / (r - 1)


def main():
    out_path = REPO / 'results' / 'oracle_2d_2e.json'
    out = json.loads(out_path.read_text()) if out_path.exists() else {}
    for name in ('He', 'H2'):
        protons, n_el = system_catalogue[2][name]
        assert n_el == 2
        key = f"{name}_2d_L{BOX_LENGTH:g}"
        rec = out.get(key, {'protons': np.asarray(protons).tolist(),
                            'box_length': BOX_LENGTH, 'energies': {}})
        for n in GRIDS:
            if str(n) in rec['energies']:
                continue
            t0 = time.time()
            e, _, _, _ = exact_ground_state_2d_2e(protons, BOX_LENGTH,
                                                  n_grid=n)
            rec['energies'][str(n)] = e
            print(f"{key} n={n}: E={e:.6f} ({time.time()-t0:.0f}s)",
                  flush=True)
            out[key] = rec
            out_path.write_text(json.dumps(out, indent=2))
        es = rec['energies']
        rec['richardson_32_40'] = richardson(es['24'], es['32'], 24, 32) \
            if '40' not in es else richardson(es['32'], es['40'], 32, 40)
        out[key] = rec
        out_path.write_text(json.dumps(out, indent=2))
        print(f"{key}: Richardson E = {rec['richardson_32_40']:.6f}",
              flush=True)


if __name__ == '__main__':
    main()
