"""lesionvae_tpu.viz"""
