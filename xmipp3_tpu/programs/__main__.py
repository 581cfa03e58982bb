from xmipp3_tpu.programs import main

raise SystemExit(main())
