"""lesionvae_tpu.utils"""
