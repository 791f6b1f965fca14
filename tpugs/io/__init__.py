from tpugs.io.ply import write_gaussian_ply, read_gaussian_ply
