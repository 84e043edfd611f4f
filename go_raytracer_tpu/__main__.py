from go_raytracer_tpu.cli import main

raise SystemExit(main())
