from tpugs.ops.projection import ProjectionOutput, project_gaussians
