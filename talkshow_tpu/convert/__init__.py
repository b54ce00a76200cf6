from talkshow_tpu.convert import torch_weights  # noqa: F401
