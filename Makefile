# Build layer — the counterpart of the reference's CMakeLists.txt
# (single target + OVERDRIVE/SHERLOCK options) for a JAX package whose
# only ahead-of-time artifact is the native ANSI encoder.

PY ?= python
CXX ?= g++
# OVERDRIVE (reference CMakeLists.txt:10-12): native-arch optimisation
# for the host-side encoder.  SHERLOCK (CMakeLists.txt:14-16) is a
# runtime flag here: `python -m euler_tpu --sherlock` traps NaNs.
OVERDRIVE ?= 1
CXXFLAGS := -O2 -shared -fPIC $(if $(filter 1,$(OVERDRIVE)),-march=native,)

NATIVE := euler_tpu/native/_encoder.so

.PHONY: all native test bench clean

all: native

native: $(NATIVE)

$(NATIVE): euler_tpu/native/encoder.cpp
	$(CXX) $(CXXFLAGS) -o $@ $<

# Sharded into sequential pytest subprocesses: one long-lived process
# accumulates XLA compile-arena memory until a late large Mosaic compile
# segfaults (test_substep_fused at ~97% of a monolithic run; it passes
# in isolation).  See tools/run_tests.sh for the groups.
test:
	bash tools/run_tests.sh

bench:
	$(PY) bench.py

clean:
	rm -f $(NATIVE)
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
