# Reference counterpart: the repo-root Makefile/init.sh of SamvitJ/Accel
# (builds native extensions; SURVEY.md §3.5).

.PHONY: native test bench clean

native:
	bash init.sh

test: native
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -rf accel_tpu/native/build accel_tpu/native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
