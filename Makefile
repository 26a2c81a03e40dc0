.PHONY: test test-fast bench native clean

native:
	$(MAKE) -C speech_recognition_tpu/native

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -m "not slow" --ignore=tests/test_zoo.py

bench: native
	python bench.py

clean:
	$(MAKE) -C speech_recognition_tpu/native clean
	rm -rf .jax_cache .pytest_cache
