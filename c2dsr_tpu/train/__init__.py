"""c2dsr_tpu.train subpackage."""
