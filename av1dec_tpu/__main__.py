from av1dec_tpu.cli import main

raise SystemExit(main())
