from ccst_tpu.models.vgg import (
    ENCODER_ARCH,
    DECODER_ARCH,
    init_params,
    apply_encoder,
    apply_decoder,
    encoder_taps,
)
