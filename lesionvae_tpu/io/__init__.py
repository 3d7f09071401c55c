"""lesionvae_tpu.io"""
