from bayestpu.kernels import mask_bank  # noqa: F401
