{{- define "longbow-tpu.fullname" -}}
{{- printf "%s" .Release.Name | trunc 63 | trimSuffix "-" -}}
{{- end }}
{{- define "longbow-tpu.labels" -}}
app.kubernetes.io/name: longbow-tpu
app.kubernetes.io/instance: {{ .Release.Name }}
{{- end }}
{{- define "longbow-tpu.selectorLabels" -}}
app.kubernetes.io/name: longbow-tpu
app.kubernetes.io/instance: {{ .Release.Name }}
{{- end }}
{{/* comma-separated host:data:meta peer list over the headless svc */}}
{{- define "longbow-tpu.peers" -}}
{{- $name := include "longbow-tpu.fullname" . -}}
{{- $svc := include "longbow-tpu.fullname" . -}}
{{- $ns := .Release.Namespace -}}
{{- $data := .Values.ports.data -}}
{{- $meta := .Values.ports.meta -}}
{{- $n := int .Values.replicaCount -}}
{{- $peers := list -}}
{{- range $i := until $n -}}
{{- $peers = append $peers (printf "%s-%d.%s.%s.svc.cluster.local:%d:%d" $name $i $svc $ns (int $data) (int $meta)) -}}
{{- end -}}
{{- join "," $peers -}}
{{- end }}
