# longbow-tpu serving image (reference: Dockerfile / Dockerfile.gpu —
# here one image, TPU access via the host's libtpu)
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
# the native C++ source ships inside the package (native_src/);
# storage/native.py compiles it on first use with the g++ above
COPY longbow_tpu/ longbow_tpu/
COPY tools/ tools/

RUN pip install --no-cache-dir "jax[tpu]" pyarrow prometheus_client numpy

EXPOSE 3000 3001 9090
ENV LONGBOW_DATA_DIR=/data
VOLUME /data

CMD ["python", "-m", "longbow_tpu.serve"]
