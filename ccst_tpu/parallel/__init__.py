from ccst_tpu.parallel.fed_mesh import (
    ParallelFedTrainer,
    make_fed_mesh,
)
