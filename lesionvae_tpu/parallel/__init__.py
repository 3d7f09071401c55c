"""lesionvae_tpu.parallel"""
