from talkshow_tpu.models import face, layers, pixelcnn, vqvae, wav2vec  # noqa: F401
