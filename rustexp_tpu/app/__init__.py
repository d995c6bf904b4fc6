"""Application layer: CLI driver, benchmark harness, PNG output.

Replaces the reference's Haskell GLFW shell (hs-src/Main.hs, App.hs) with a
headless driver: scene selection flags instead of keybindings, PNG frames
instead of an OpenGL window, and a regression benchmark harness modeled on
the reference's built-in rast_benchmark (rasterizer.rs:1781-1884).
"""
