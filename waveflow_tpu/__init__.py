"""waveflow_tpu — a TPU-native framework for boundary-conditioned
normalizing-flow wavefunctions and variational quantum Monte Carlo.

Re-designed from scratch for JAX/XLA/Pallas/pjit with the capabilities of
the reference library `aspuru-guzik-group/waveflow` (see SURVEY.md): spline
kernels (L1) -> bijections (L2) -> flow/wavefunction models (L3) -> physics
(L4) -> VMC & density-estimation drivers (L5), plus multi-device walker
sharding the reference lacks.
"""

__version__ = "0.1.0"
