"""TPU-native full-waveform inversion for ring-array ultrasound tomography.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
frequency-domain FWI pipeline (Alighieri1231/WaveformInversionUST): on-device
matrix-free Helmholtz solvers, exact adjoints via custom VJP, jitted nonlinear
conjugate-gradient and L-BFGS inversion loops, multi-frequency continuation,
and mesh-sharded source/frequency parallelism.
"""

from .config import (AcquisitionConfig, ContinuationConfig, FWIConfig,
                     MomentumFormula, PMLConfig, SolverConfig, SolverMethod,
                     StencilConfig, StepSizeFormula)
from .models.grid import Grid2D
from .models.grid3d import Grid3D
from .models.acquisition import RingAcquisition, build_ring_acquisition
from .ops.solve import (HelmholtzOperator, helmholtz_operator_solve,
                        make_helmholtz_operator, solve_helmholtz)
from .fwi.objective import FWIData, build_fwi_data
from .fwi.optimizers import CGResult, nonlinear_cg
from .fwi.multifreq import (MultiFreqData, nonlinear_cg_multifreq,
                            nonlinear_cg_multifreq_sharded, stack_frequencies)
from .fwi.fwi3d import (FWIData3D, build_fwi_data_3d, encode_supershots,
                        nonlinear_cg_3d)
from .fwi.lbfgs import run_lbfgs
from .fwi.newton import (GNResult, make_frechet_operators, run_gauss_newton,
                         run_gauss_newton_3d)
from .fwi.runner import invert_dataset, reconstruction_rmse
from .fwi.traveltime import (invert_travel_times, pick_arrival_times,
                             straight_ray_times, traveltime_init)
from .fwi.eikonal import eikonal_solve, trace_rays
from .fwi.calibrate import (CalibrationResult, background_misfit_fn,
                            background_misfit_fn_3d,
                            calibrate_background_speed,
                            calibrate_background_speed_3d)
from .fwi.eikonal3d import (eikonal_solve_3d, eikonal_receiver_times_3d,
                            trace_rays_3d)
from .fwi.traveltime3d import (invert_travel_times_3d,
                               invert_travel_times_bent_3d,
                               straight_ray_times_3d, traveltime_init_3d)
from .data.timedomain3d import (TimeDomainDataset3D, direct_arrival_gate_3d,
                                synthesize_time_domain_dataset_3d,
                                timedomain_to_fwi_data_3d)
from .fwi.runner3d import (InversionResult3D, invert_dataset_3d,
                           reconstruction_rmse_3d)
from .fwi.fwi3d import scattered_data_3d
from .models.acquisition3d import (Acquisition3D, build_acquisition3d,
                                   cylinder_positions, hemisphere_positions)
from .parallel.spike import (SpikeFactor, spike_factor, spike_helmholtz_factor,
                             spike_helmholtz_solve, spike_solve)

__version__ = "0.1.0"
