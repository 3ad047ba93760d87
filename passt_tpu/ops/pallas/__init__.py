from passt_tpu.ops.pallas.mel_kernel import fused_log_mel

__all__ = ["fused_log_mel"]
