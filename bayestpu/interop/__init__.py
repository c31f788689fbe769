from bayestpu.interop import torch_import  # noqa: F401
