"""lesionvae_tpu.train"""
