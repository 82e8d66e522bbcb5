"""c2dsr_tpu.evaluate subpackage."""
