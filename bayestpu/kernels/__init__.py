from bayestpu.kernels import mask_bank  # noqa: F401
from bayestpu.kernels.masked_matmul import (  # noqa: F401
    bank_matmul,
    bank_matmul_inference,
    bank_matmul_int8,
    bank_matmul_samples,
    dropout_matmul,
    dropout_matmul_inference,
    dropout_matmul_int8,
    dropout_matmul_samples,
)
from bayestpu.kernels.masked_conv import (  # noqa: F401
    bank_conv,
    bank_conv_inference,
    bank_conv_int8,
    bank_conv_samples,
    dropout_conv,
    dropout_conv_inference,
    dropout_conv_int8,
    dropout_conv_samples,
    mask_apply_nhwc,
)
