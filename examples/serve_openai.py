"""Serve a quantized checkpoint over the OpenAI-compatible API.

  python examples/serve_openai.py /path/to/quantized-ckpt --port 8000

Then:
  curl localhost:8000/v1/chat/completions -d '{"messages": [...]}'
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()

    from ganq_tpu import GanqModel

    model = GanqModel.load(args.model_dir)
    server = model.serve(host=args.host, port=args.port)
    server.wait_until_ready()
    print(f"serving on http://{args.host}:{server.port} — ctrl-c to stop")
    try:
        import time
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
