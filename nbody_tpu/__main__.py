from nbody_tpu.cli import main

raise SystemExit(main())
