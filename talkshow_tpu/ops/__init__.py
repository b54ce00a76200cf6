from talkshow_tpu.ops import audio, pose, rotation  # noqa: F401
