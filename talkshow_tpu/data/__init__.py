from talkshow_tpu.data import dataset  # noqa: F401
