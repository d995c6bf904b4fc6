"""Software rasterizer: camera paths, shader library, render pipeline.

TPU-native redesign of the reference's Rust rasterizer (rs-src/rasterizer.rs):
vertex transforms are batched matmuls, rasterization is a binned tile kernel
producing a (tri_id, barycentric, z) G-buffer, and all 16 shaders run as one
deferred, vectorized pass over the frame — each visible pixel is shaded
exactly once, instead of per overdrawn fragment as in the reference.
"""
