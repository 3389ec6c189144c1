from palace_tpu.pipeline.stages import Stage, StageRunner, StageSkipped
