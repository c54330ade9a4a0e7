# Dataset fetchers (parity with the reference Makefile's `download`
# target, /root/reference/Makefile:1-14). These need network egress;
# in sealed environments benchmarks fall back to synthetic corpora.

DATA ?= data

download: $(DATA)
	curl -L -o $(DATA)/wiki-news-300d-1M.vec.zip \
	  https://dl.fbaipublicfiles.com/fasttext/vectors-english/wiki-news-300d-1M.vec.zip
	unzip -o $(DATA)/wiki-news-300d-1M.vec.zip -d $(DATA)

download-sift: $(DATA)
	curl -L -o $(DATA)/sift.tar.gz ftp://ftp.irisa.fr/local/texmex/corpus/sift.tar.gz
	tar -xzf $(DATA)/sift.tar.gz -C $(DATA)

download-glove: $(DATA)
	curl -L -o $(DATA)/glove.6B.zip https://nlp.stanford.edu/data/glove.6B.zip
	unzip -o $(DATA)/glove.6B.zip -d $(DATA)

$(DATA):
	mkdir -p $(DATA)

native:
	g++ -O3 -shared -fPIC -std=c++17 vers_tpu/native/io_native.cpp \
	  -o vers_tpu/native/libversio.so

# quick tier: skips the `slow`-marked wave-build / partitioned /
# subprocess-dryrun tests so the edit-test loop stays under ~5 min on
# this 1-core host. `test-all` is the full pyramid (CI / end of round).
test:
	python -m pytest tests/ -x -q -m "not slow"

test-all:
	python -m pytest tests/ -x -q

bench:
	python bench.py

# Rehearse the driver's exact end-of-round commands (VERDICT r3 #6):
# canary gate -> bench.py -> multichip dryrun. No round ends without
# this green. Each step fails loudly on rc != 0.
preflight:
	python -c "from vers_tpu.utils.profiling import tunnel_canary, \
	enable_compilation_cache; enable_compilation_cache(); \
	s = tunnel_canary(); print(f'canary {s:.3f}s/call'); \
	assert s < 0.2, f'tunnel degraded ({s:.3f}s/call) - do not bench now'"
	python bench.py
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8); \
	print('dryrun_multichip(8) ok')"
	@echo "preflight green"

.PHONY: download download-sift download-glove native test test-all bench preflight
