from one2345_tpu.geometry import cameras, projection, rays, sampling
