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

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

.PHONY: download download-sift download-glove native test bench
