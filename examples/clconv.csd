<CsoundSynthesizer>
<CsOptions>
-n
</CsOptions>
<CsInstruments>
; Engine-resident convolution via the TPU framework's bus inserts
; (opencl_fft_tpu.runtime.csound_host).  The signal path mirrors the
; reference demo /root/reference/csound/clconv.csd: instr 1 convolves a
; live signal with a stored IR at a fixed partition size (the ftconv /
; clconv path); instr 2 time-varying-convolves two live signals (the
; tvconv / cltvconv path).  Sources are synthesized (the reference's
; sample files are not shipped); run with examples/csound_demo.py.
sr = 44100
ksmps = 64
0dbfs = 1

instr 1 ; LTI convolution through the "clconv" insert
 ain1 pinker
 chnset ain1, "clconv_in"
 asig chnget:a("clconv_out")
 out asig*linenr(p4, 0.1, 0.5, 0.01)
endin

instr 2 ; time-varying convolution through the "cltvconv" insert
 ain1 pinker
 ain2 oscili 0.4, 2.3
 chnset ain1, "cltvconv_in1"
 chnset ain2, "cltvconv_in2"
 asig chnget:a("cltvconv_out")
 out asig*linenr(p4, 0.1, 0.5, 0.01)
endin

</CsInstruments>
<CsScore>
i1 0 4 0.005
i2 4 4 0.005
</CsScore>
</CsoundSynthesizer>
