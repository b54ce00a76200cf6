from talkshow_tpu.eval import fgd, metrics  # noqa: F401
