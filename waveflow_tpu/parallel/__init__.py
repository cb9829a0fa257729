from waveflow_tpu.parallel.mesh import (
    WALKER_AXIS, distributed_init, make_host_chip_mesh, make_walker_mesh,
    replicated, walker_sharded,
)
from waveflow_tpu.parallel.sharding import (
    make_sharded_mala_window, make_sharded_mcmc_window, make_sharded_sampler,
    make_sharded_spring_window, make_sharded_sr_window,
    make_sharded_train_step, make_sharded_train_window, psum_mean,
    shard_batch,
)
from waveflow_tpu.parallel.resample import (
    resample_walkers_sharded, systematic_indices,
)
from waveflow_tpu.parallel.probprog import (
    chain_state_spec, make_sharded_chain_sampler, make_sharded_smc,
)
