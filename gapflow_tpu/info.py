"""Environment info tool (gpf_info): versions and capabilities."""

import gapflow_tpu


def show_info():
    print(10 * "=")
    print("gapflow-tpu")
    print(10 * "=")
    print("Version:", gapflow_tpu.__version__)

    print()
    print(10 * "=")
    print("JAX")
    print(10 * "=")
    import jax
    print("Version:", jax.__version__)
    try:
        devices = jax.devices()
        print("Backend:", devices[0].platform)
        print("Devices:", len(devices))
    except Exception as exc:  # no backend available
        print("Backend: unavailable:", exc)

    print()
    print(10 * "=")
    print("MD engine")
    print(10 * "=")
    try:
        from .md._engine import Engine
        eng = Engine()
        print("Version:", eng.version())
        print("Library:", eng.lib_path)
        print("Packages:", eng.installed_packages)
        eng.close()
    except Exception as exc:
        print("native engine unavailable:", exc)

    from .md.runner import PARALLEL
    print("Thread-parallel MD:", PARALLEL)


def main():
    show_info()


if __name__ == "__main__":
    main()
