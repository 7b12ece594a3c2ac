from ccst_tpu.kernels.adain_pallas import fused_adain
from ccst_tpu.kernels.welford_pallas import channel_moments
