from talkshow_tpu.train import steps  # noqa: F401
