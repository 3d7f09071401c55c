"""lesionvae_tpu.models"""
