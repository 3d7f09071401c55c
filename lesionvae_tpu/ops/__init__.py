"""lesionvae_tpu.ops"""
