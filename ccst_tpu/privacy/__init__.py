from ccst_tpu.privacy.generator import StyleInverter
from ccst_tpu.privacy.invert import (
    InvertConfig,
    train_inverter,
    evaluate_inverter,
    psnr,
)
