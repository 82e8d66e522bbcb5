"""c2dsr_tpu.data subpackage."""
