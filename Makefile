# Build targets for the native runtime pieces.
#
# The C++ threaded frame loader also auto-builds on first import
# (neuralstyletransferv1_tpu/io/native_loader.py); this target exists for
# image builds and CI so the .so never needs to live in the tree.

CXX ?= g++
CXXFLAGS ?= -O3 -shared -fPIC

native: native/_frameloader.so

native/_frameloader.so: native/frameloader.cpp
	$(CXX) $(CXXFLAGS) $< -ljpeg -lpng -o $@

test:
	python -m pytest tests/ -x -q

test-all:
	python -m pytest tests/ -x -q -m "slow or not slow"

clean:
	rm -f native/_frameloader.so

.PHONY: native test test-all clean
