from waveflow_tpu.vmc.estimators import (
    local_energy, make_loss_fn, make_train_step, loss_fn_uniform,
    make_policy_gradient_step,
)
from waveflow_tpu.vmc.trainer import VMCConfig, VMCTrainer
from waveflow_tpu.vmc.nuts import NUTSState, make_nuts_sampler
from waveflow_tpu.vmc.mala import MALAState, make_mala_sampler
from waveflow_tpu.vmc.evaluate import (EnergyEvaluation, evaluate_energy,
                                       evaluate_trainer)
