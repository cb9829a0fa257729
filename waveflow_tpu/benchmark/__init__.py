from waveflow_tpu.benchmark.datasets import get_dataset
from waveflow_tpu.benchmark.metrics import (
    kde_metrics, pdf_grid_eval, reconstruction_distance,
)
from waveflow_tpu.benchmark.density import (
    get_benchmark_model, train_density_model,
)
