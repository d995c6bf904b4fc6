# Build/run entry points (the reference's Makefile builds cargo + stack;
# here the only compiled artifact is the native asset-loader runtime).

.PHONY: all native test bench run viewer clean

all: native

native:
	$(MAKE) -C rustexp_tpu/native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

run: native
	python -m rustexp_tpu.app.cli rasterizer --frames 4 --size 512 --out out/frame

viewer: native
	python -m rustexp_tpu.app.viewer

clean:
	$(MAKE) -C rustexp_tpu/native clean
	rm -rf out
