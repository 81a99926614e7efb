"""Generate the golden regression fixture (tests/golden/ring16.npz).

Run from the repo root on CPU:

    python tests/golden/generate.py

The fixture freezes an end-to-end miniature of the reference pipeline
(synthesize on a fine grid -> invert on a coarse grid with nonlinear CG,
reference: Lecture19_Fwi/RunFwi.m:1-63) so that future refactors cannot
silently change the physics. Tolerances in tests/test_golden.py are loose
enough to survive XLA version bumps but tight enough to catch real drift
(stencil coefficients, adjoint rule, step-size formula, source estimation).
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from waveforminversionust_tpu import (AcquisitionConfig, FWIConfig, Grid2D,
                                      PMLConfig, SolverConfig)
from waveforminversionust_tpu.data.synthesize import synthesize_ring_dataset
from waveforminversionust_tpu.fwi.runner import invert_dataset
from waveforminversionust_tpu.models.phantom import smooth_blob_phantom

FREQ = 350e3
N_ELEM = 16
RADIUS = 16e-3

# Fine simulation grid (avoids the inverse crime of inverting on the
# synthesis grid) and coarse inversion grid.
FINE = Grid2D.centered(44e-3, 0.5e-3)
COARSE = Grid2D.centered(44e-3, 1.0e-3)
SOLVER = SolverConfig(pml=PMLConfig(l_pml=4e-3))
ACQ = AcquisitionConfig(num_elements=N_ELEM, radius=RADIUS,
                        num_excluded_each_side=2)
FWI = FWIConfig(num_iterations=4, c_init=1500.0)


def build():
    vel_true = smooth_blob_phantom(FINE, radius=8e-3, dc=40.0, c_bkgnd=1500.0)
    ds = synthesize_ring_dataset(np.asarray(vel_true), FINE, ACQ, f=FREQ,
                                 solver=SOLVER, seed=7)
    res = invert_dataset(ds, grid=COARSE, acquisition=ACQ, solver=SOLVER,
                         fwi=FWI)
    return ds, res


if __name__ == "__main__":
    ds, res = build()
    out = os.path.join(os.path.dirname(__file__), "ring16.npz")
    np.savez_compressed(
        out,
        rec_re=np.real(ds.rec_data), rec_im=np.imag(ds.rec_data),
        x=ds.x, y=ds.y, c=ds.c,
        x_circ=ds.x_circ, y_circ=ds.y_circ, f=ds.f,
        velocity=np.asarray(res.velocity, np.float32),
        loss=np.asarray(res.metrics["loss"], np.float64),
        step=np.asarray(res.metrics["step_size"], np.float64),
    )
    print("wrote", out)
    print("loss history:", res.metrics["loss"])
    print("vel range:", float(np.min(res.velocity)),
          float(np.max(res.velocity)))
