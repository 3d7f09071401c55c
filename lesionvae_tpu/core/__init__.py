"""lesionvae_tpu.core"""
