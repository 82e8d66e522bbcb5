"""c2dsr_tpu.graph subpackage."""
