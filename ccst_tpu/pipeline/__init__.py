from ccst_tpu.pipeline.style_bank import compute_style_bank, load_style_stats, save_style_stats
from ccst_tpu.pipeline.stylize import StylizeEngine, run_overall_transfer, run_single_transfer
