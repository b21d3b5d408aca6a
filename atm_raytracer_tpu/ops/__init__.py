"""Device compute kernels: crossing detection, coloring, compositing, objects."""
