"""c2dsr_tpu.ops subpackage."""
