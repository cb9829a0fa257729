from waveflow_tpu.models.priors import Normal, Uniform, GMM
from waveflow_tpu.models.flow import Flow, InvFlow
from waveflow_tpu.models.mflow import MFlow
from waveflow_tpu.models.waveflow import Waveflow
from waveflow_tpu.models.factory import get_model, get_waveflow_model
from waveflow_tpu.models.antisym import (antisymmetrize_model,
                                         get_antisym_waveflow_model)
