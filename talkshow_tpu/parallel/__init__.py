from talkshow_tpu.parallel import mesh  # noqa: F401
