from gamer_tpu.models.tokenizer.rqvae import RQVAE, RQVAEConfig

__all__ = ["RQVAE", "RQVAEConfig"]
