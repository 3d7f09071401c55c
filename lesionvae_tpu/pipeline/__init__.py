"""lesionvae_tpu.pipeline"""
